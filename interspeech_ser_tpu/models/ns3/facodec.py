"""NS3 FACodec prosody path on TPU (NaturalSpeech3 encoder/decoder subset).

The reference extracts two trimodal prosody features per utterance
(reference: preprocessing/preprocess_ns3_prosody.py:41-62 and
…_speaker.py): pad wav to %200, 80-mel log spectrogram → first 20 bins
(facodec.py:816-817), melspec_linear(20→256) + 4-layer transformer →
prosody ResidualVQ (1× FactorizedVectorQuantize, 1024×8 codebook)
(facodec.py:1022-1044) — and for the speaker variant additionally the
FACodecEncoderV2 SnakeBeta conv stack (hop 200) fed through the timbre
transformer, concatenated to 512-d (facodec.py:1046-1074).

Everything here is the JAX/flax re-design of that subset: feature-last
layouts, matmul-DFT mel frontend (ops/mel.py machinery), alias-free
kaiser-sinc resampled Snake activations as grouped convolutions, and the
NS3 transformer including its per-batch-index positional-encoding quirk
(transformer.py:44-45 adds ``pe[:batch]`` to a batch-first tensor —
replicated, not fixed, per SURVEY.md §7.8). Weight-normed convs/linears are
folded at conversion. The GRL-guarded f0/phone/timbre predictor heads and
the HiFiGAN decoder are outside the extraction path and intentionally not
ported (SURVEY.md §7.7).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.attention import TorchMultiheadAttention
from ...ops.mel import mel_filter_bank_slaney, stft_power

# ---------------------------------------------------------------------------
# Mel frontend (reference src/ns3/melspec.py:39-102)
# ---------------------------------------------------------------------------


def ns3_mel_spectrogram(wav: jnp.ndarray, pre_padded: bool = False) -> jnp.ndarray:
    """[B, L] → log-mel [B, 80, T], T = 1 + (L - 1024 + 824)//200.

    torch parity: reflect pad (n_fft-hop)/2=412 each side, center=False
    stft with n_fft 1024 / hop 200 / periodic-hann win 800 (zero-padded to
    1024), magnitude sqrt(power + 1e-9), slaney mel 0-8 kHz, log(clip 1e-5).

    ``pre_padded=True`` skips the on-device reflect pad: the extraction
    pipeline reflect-pads each utterance on the host BEFORE zero-padding to
    the bucket length, so frames up to the true length match the
    reference's batch-1 computation bit-for-bit (zero bucket padding would
    otherwise replace the reflection samples at the tail).
    """
    if not pre_padded:
        wav = jnp.pad(wav.astype(jnp.float32), ((0, 0), (412, 412)), mode="reflect")
    power = stft_power(wav, n_fft=1024, hop_length=200, win_length=800, center=False)
    mag = jnp.sqrt(power + 1e-9)  # [B, T, 513]
    fb = jnp.asarray(mel_filter_bank_slaney(513, 80, 0.0, 8000.0, 16000))
    mel = mag @ fb  # [B, T, 80]
    mel = jnp.log(jnp.clip(mel, min=1e-5))
    return jnp.transpose(mel, (0, 2, 1))


def get_prosody_feature(wav: jnp.ndarray, pre_padded: bool = False) -> jnp.ndarray:
    """First 20 mel bins (facodec.py:816-817)."""
    return ns3_mel_spectrogram(wav, pre_padded)[:, :20, :]


# ---------------------------------------------------------------------------
# Alias-free Snake activation (reference src/ns3/alias_free_torch + SnakeBeta)
# ---------------------------------------------------------------------------


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    f = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    f /= f.sum()
    return f.astype(np.float32)


def _depthwise_kernel(filt: np.ndarray, channels: int) -> jnp.ndarray:
    """[k] filter → flax NHC depthwise kernel [k, 1, C] (same filter/channel)."""
    return jnp.asarray(np.tile(filt[:, None, None], (1, 1, channels)))


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """x + (1/exp(β))·sin²(x·exp(α)), log-scale parameters [C] (x: [B,T,C])."""
    a = jnp.exp(alpha)[None, None, :]
    b = jnp.exp(beta)[None, None, :]
    return x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(x * a))


def _upsample2(x: jnp.ndarray, filt: np.ndarray) -> jnp.ndarray:
    """UpSample1d(ratio=2, k=12) on [B, T, C] (resample.py:10-38)."""
    B, T, C = x.shape
    k = len(filt)
    pad = k // 2 - 1  # = 5
    x = jnp.concatenate(
        [jnp.repeat(x[:, :1], pad, 1), x, jnp.repeat(x[:, -1:], pad, 1)], axis=1
    )
    kernel = _depthwise_kernel(filt[::-1].copy(), C)  # transpose-conv flip
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(2,), dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=C,
    )
    y = 2.0 * y
    pad_left = pad * 2 + (k - 2) // 2
    pad_right = pad * 2 + (k - 1) // 2
    return y[:, pad_left:-pad_right]


def _downsample2(x: jnp.ndarray, filt: np.ndarray) -> jnp.ndarray:
    """DownSample1d(ratio=2, k=12): replicate pad + strided lowpass."""
    B, T, C = x.shape
    k = len(filt)
    even = k % 2 == 0
    pad_left = k // 2 - int(even)
    pad_right = k // 2
    x = jnp.concatenate(
        [jnp.repeat(x[:, :1], pad_left, 1), x, jnp.repeat(x[:, -1:], pad_right, 1)],
        axis=1,
    )
    kernel = _depthwise_kernel(filt, C)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(2,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=C,
    )


_UP_FILTER = kaiser_sinc_filter1d(0.25, 0.3, 12)
_DOWN_FILTER = kaiser_sinc_filter1d(0.25, 0.3, 12)


class SnakeAct1d(nn.Module):
    """Activation1d: 2× kaiser-sinc upsample → SnakeBeta → 2× downsample."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.zeros, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        h = _upsample2(x, _UP_FILTER)
        h = snake_beta(h, alpha, beta)
        return _downsample2(h, _DOWN_FILTER)


# ---------------------------------------------------------------------------
# FACodec encoder conv stack (reference facodec.py:117-151, 767-840)
# ---------------------------------------------------------------------------


class _ResidualUnit(nn.Module):
    dim: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        pad = ((7 - 1) * self.dilation) // 2
        h = SnakeAct1d(self.dim, name="act1")(x)
        h = nn.Conv(
            self.dim, (7,), kernel_dilation=(self.dilation,), padding=[(pad, pad)],
            name="conv1",
        )(h)
        h = SnakeAct1d(self.dim, name="act2")(h)
        h = nn.Conv(self.dim, (1,), name="conv2")(h)
        return x + h


class _EncoderBlock(nn.Module):
    dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        h = _ResidualUnit(self.dim // 2, 1, name="res1")(x)
        h = _ResidualUnit(self.dim // 2, 3, name="res2")(h)
        h = _ResidualUnit(self.dim // 2, 9, name="res3")(h)
        h = SnakeAct1d(self.dim // 2, name="act")(h)
        s = self.stride
        pad = s // 2 + s % 2
        return nn.Conv(
            self.dim, (2 * s,), strides=(s,), padding=[(pad, pad)], name="down"
        )(h)


class FACodecEncoderV2Model(nn.Module):
    """wav [B, L] (L % 200 == 0) → [B, T=L/200, out_channels]."""

    ngf: int = 32
    up_ratios: Tuple[int, ...] = (2, 4, 5, 5)
    out_channels: int = 256

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        x = wav[:, :, None].astype(jnp.float32)
        x = nn.Conv(self.ngf, (7,), padding=[(3, 3)], name="conv_in")(x)
        d = self.ngf
        for i, stride in enumerate(self.up_ratios):
            d *= 2
            x = _EncoderBlock(d, stride, name=f"block{i}")(x)
        x = SnakeAct1d(d, name="act_out")(x)
        return nn.Conv(self.out_channels, (3,), padding=[(1, 1)], name="conv_out")(x)


# ---------------------------------------------------------------------------
# NS3 transformer (reference src/ns3/transformer.py)
# ---------------------------------------------------------------------------


def _ns3_positional_table(max_len: int, d_model: int) -> np.ndarray:
    position = np.arange(max_len)[:, None]
    div = np.exp(np.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class _NS3Layer(nn.Module):
    hidden: int
    heads: int
    filter_size: int
    kernel_size: int

    @nn.compact
    def __call__(self, x, key_mask=None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name)
        h = ln("ln_1")(x)
        h = TorchMultiheadAttention(self.hidden, self.heads, name="self_attn")(
            h, h, h, key_mask=key_mask
        )
        x = x + h
        h = ln("ln_2")(x)
        if key_mask is not None:
            # zero the padded tail before the conv-FFN: frame T-1 then sees
            # zeros beyond the boundary, exactly like the reference's conv
            # zero padding at the (unpadded) tensor edge
            h = h * key_mask[:, :, None].astype(h.dtype)
        h = nn.Conv(
            self.filter_size, (self.kernel_size,),
            padding=[(self.kernel_size // 2,) * 2], name="ffn_1",
        )(h)
        h = nn.relu(h)
        h = nn.Dense(self.hidden, name="ffn_2")(h)
        return x + h


class NS3TransformerEncoder(nn.Module):
    """4-layer pre-LN transformer with the reference PE quirk.

    ``pe_batch1=True`` adds ``pe[0]`` to every row — the semantics every
    utterance experiences under the reference's batch-1 extraction; the
    default replicates the literal torch behavior (row b gets ``pe[b]``).
    """

    hidden: int = 256
    heads: int = 4
    layers: int = 4
    filter_size: int = 1024
    kernel_size: int = 5
    max_len: int = 5000
    pe_batch1: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, key_mask=None) -> jnp.ndarray:
        pe = jnp.asarray(_ns3_positional_table(self.max_len, self.hidden))
        B = x.shape[0]
        if self.pe_batch1:
            x = x + pe[0][None, None, :]
        else:
            # reference quirk (transformer.py:44-45): batch-first input
            # indexed as if time-first — row b gets pe[b] at EVERY timestep
            x = x + pe[:B][:, None, :]
        for i in range(self.layers):
            x = _NS3Layer(
                self.hidden, self.heads, self.filter_size, self.kernel_size,
                name=f"layer{i}",
            )(x, key_mask)
        return nn.LayerNorm(epsilon=1e-5, name="last_ln")(x)


# ---------------------------------------------------------------------------
# Factorized VQ decode (reference src/ns3/quantize/fvq.py:94-109)
# ---------------------------------------------------------------------------


def fvq_forward(
    z: jnp.ndarray,  # [B, T, D] pre-projection latents (feature-last)
    in_kernel: jnp.ndarray,  # [D, d_code]
    in_bias: jnp.ndarray,
    out_kernel: jnp.ndarray,  # [d_code, D]
    out_bias: jnp.ndarray,
    codebook: jnp.ndarray,  # [N, d_code]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (quantized [B, T, D], indices [B, T]); inference path (no STE)."""
    z_e = z @ in_kernel + in_bias  # [B, T, d]
    e = z_e / jnp.maximum(jnp.linalg.norm(z_e, axis=-1, keepdims=True), 1e-12)
    c = codebook / jnp.maximum(jnp.linalg.norm(codebook, axis=-1, keepdims=True), 1e-12)
    dist = (
        jnp.sum(e * e, axis=-1, keepdims=True)
        - 2 * e @ c.T
        + jnp.sum(c * c, axis=-1)[None, None, :]
    )
    indices = jnp.argmax(-dist, axis=-1)  # [B, T]
    z_q = codebook[indices]  # un-normalized codebook vectors (decode_code)
    return z_q @ out_kernel + out_bias, indices


# ---------------------------------------------------------------------------
# Top-level prosody extractor
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ProsodyExtractor:
    """Bundles the decoder prosody path (+ optional speaker/timbre path).

    params keys: 'melspec_linear' {kernel,bias}, 'melspec_encoder' (NS3
    transformer), 'fvq' {in_kernel,in_bias,out_kernel,out_bias,codebook},
    and for the speaker variant 'encoder' (FACodecEncoderV2Model) +
    'timbre_encoder' (NS3 transformer).

    ``__call__`` is the literal torch forward (use for golden tests /
    unbatched runs). ``extract_batched`` is the pipeline path: host
    reflect-padded mel input + frame masks + batch-1 PE semantics, which
    reproduces the reference's per-utterance extraction inside a padded
    batch. The prosody branch is exact; the speaker variant's conv stack
    sees the bucket's zero padding at each utterance's tail (the
    alias-free resample replicate-pads the bucket edge, not the utterance
    edge), so a second right-aligned tail window re-runs the stack with
    the TRUE utterance end at the tensor edge and the last ``FIX_FRAMES``
    valid frames are overwritten with its exact values
    (``tail_exact=True``; utterances shorter than ``TAIL_WINDOW_FRAMES``
    keep the documented ~3-frame approximation).
    """

    params: Dict
    with_speaker: bool = False
    tail_exact: bool = True
    # window ≥ overwrite zone + conv-stack receptive field (~43 frames);
    # both multiples of anything ≥ the deviation zone work — validated
    # empirically in tests/test_ns3_facodec.py
    TAIL_WINDOW_FRAMES = 96
    FIX_FRAMES = 48

    def __post_init__(self):
        self._mel_encoder = NS3TransformerEncoder()
        self._mel_encoder_b1 = NS3TransformerEncoder(pe_batch1=True)
        self._enc_model = FACodecEncoderV2Model()

    def _prosody_branch(self, f0_20: jnp.ndarray, encoder, key_mask=None):
        """[B, T, 20] mel bins → (quantized [B,T,256], codes [B,T])."""
        p = self.params
        f0 = f0_20 @ p["melspec_linear"]["kernel"] + p["melspec_linear"]["bias"]
        f0 = encoder.apply({"params": p["melspec_encoder"]}, f0, key_mask=key_mask)
        return fvq_forward(
            f0, p["fvq"]["in_kernel"], p["fvq"]["in_bias"],
            p["fvq"]["out_kernel"], p["fvq"]["out_bias"], p["fvq"]["codebook"],
        )

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """wav [B, L%200==0] → prosody [B, T, 256] (or [B, T, 512] speaker)."""
        f0_20 = jnp.transpose(get_prosody_feature(wav), (0, 2, 1))
        out, _ = self._prosody_branch(f0_20, self._mel_encoder)
        if not self.with_speaker:
            return out
        enc = self._enc_model.apply({"params": self.params["encoder"]}, wav)
        timbre = self._mel_encoder.apply(
            {"params": self.params["timbre_encoder"]}, enc
        )
        return jnp.concatenate([out, timbre], axis=-1)

    def extract_batched(
        self,
        wav: jnp.ndarray,  # [B, Lb] zero-padded to bucket, L_i % 200 == 0
        wav_reflect: jnp.ndarray,  # [B, Lb + 824] host reflect-padded per utt
        frame_mask: jnp.ndarray,  # [B, Tb], 1 for t < L_i/200
    ) -> jnp.ndarray:
        f0_20 = jnp.transpose(
            get_prosody_feature(wav_reflect, pre_padded=True), (0, 2, 1)
        )
        out, _ = self._prosody_branch(f0_20, self._mel_encoder_b1, key_mask=frame_mask)
        if not self.with_speaker:
            return out
        enc = self._enc_model.apply({"params": self.params["encoder"]}, wav)
        if self.tail_exact:
            enc = self._fix_tail(wav, enc, frame_mask)
        enc = enc * frame_mask[:, :, None]
        timbre = self._mel_encoder_b1.apply(
            {"params": self.params["timbre_encoder"]}, enc, key_mask=frame_mask
        )
        return jnp.concatenate([out, timbre], axis=-1)

    def _fix_tail(self, wav, enc, frame_mask):
        """Overwrite each utterance's last FIX_FRAMES conv features with an
        exact re-run on a right-aligned tail window (true end at the tensor
        edge, so every replicate pad acts on the real last samples)."""
        R = self.TAIL_WINDOW_FRAMES
        FIX = self.FIX_FRAMES
        B, Lb = wav.shape
        T = enc.shape[1]
        t_valid = frame_mask.sum(axis=1).astype(jnp.int32)  # [B] frames
        length = t_valid * 200
        pos = jnp.arange(R * 200)[None, :]
        src = length[:, None] - R * 200 + pos
        tail = jnp.take_along_axis(wav, jnp.clip(src, 0, Lb - 1), axis=1)
        tail = tail * (src >= 0)
        enc_tail = self._enc_model.apply({"params": self.params["encoder"]}, tail)
        t = jnp.arange(T)[None, :]
        tail_idx = jnp.clip(t - t_valid[:, None] + R, 0, R - 1)
        gathered = jnp.take_along_axis(enc_tail, tail_idx[:, :, None], axis=1)
        fix = (
            (t >= t_valid[:, None] - FIX)
            & (t < t_valid[:, None])
            & (t_valid[:, None] >= R)
        )
        return jnp.where(fix[:, :, None], gathered, enc)

    def codes(self, wav: jnp.ndarray) -> jnp.ndarray:
        """Prosody VQ code indices (the …_prosodycodes legacy variant)."""
        f0_20 = jnp.transpose(get_prosody_feature(wav), (0, 2, 1))
        _, idx = self._prosody_branch(f0_20, self._mel_encoder)
        return idx


# ---------------------------------------------------------------------------
# Checkpoint converters (ns3_facodec_{encoder,decoder}_v2.bin)
# ---------------------------------------------------------------------------


def _fold_wn_linear(sd: Dict, prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    """torch weight_norm Linear (dim=0): w = g·v/‖v‖_rows → flax [in,out]."""
    for g_name, v_name in (
        (f"{prefix}.weight_g", f"{prefix}.weight_v"),
        (f"{prefix}.parametrizations.weight.original0", f"{prefix}.parametrizations.weight.original1"),
    ):
        if g_name in sd:
            g = np.asarray(sd[g_name])  # [out, 1]
            v = np.asarray(sd[v_name])  # [out, in]
            w = g * v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            return w.T, np.asarray(sd[f"{prefix}.bias"])
    return np.asarray(sd[f"{prefix}.weight"]).T, np.asarray(sd[f"{prefix}.bias"])


def _fold_wn_conv(sd: Dict, prefix: str) -> Tuple[np.ndarray, np.ndarray]:
    """torch weight_norm Conv1d (dim=0) → flax NHC kernel [k, in, out]."""
    for g_name, v_name in (
        (f"{prefix}.weight_g", f"{prefix}.weight_v"),
        (f"{prefix}.parametrizations.weight.original0", f"{prefix}.parametrizations.weight.original1"),
    ):
        if g_name in sd:
            g = np.asarray(sd[g_name])  # [out, 1, 1]
            v = np.asarray(sd[v_name])  # [out, in, k]
            norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
            w = g * v / np.maximum(norm, 1e-12)
            return np.transpose(w, (2, 1, 0)), np.asarray(sd[f"{prefix}.bias"])
    w = np.asarray(sd[f"{prefix}.weight"])
    return np.transpose(w, (2, 1, 0)), np.asarray(sd[f"{prefix}.bias"])


def _ns3_transformer_params(sd: Dict, prefix: str, layers: int = 4) -> Dict:
    p: Dict = {}
    dot = f"{prefix}." if prefix else ""
    for i in range(layers):
        base = f"{dot}layers.{i}"
        p[f"layer{i}"] = {
            "ln_1": {"scale": np.asarray(sd[f"{base}.ln_1.weight"]),
                     "bias": np.asarray(sd[f"{base}.ln_1.bias"])},
            "ln_2": {"scale": np.asarray(sd[f"{base}.ln_2.weight"]),
                     "bias": np.asarray(sd[f"{base}.ln_2.bias"])},
            "self_attn": {
                "in_proj_kernel": np.asarray(sd[f"{base}.self_attn.in_proj_weight"]).T,
                "in_proj_bias": np.asarray(sd[f"{base}.self_attn.in_proj_bias"]),
                "out_kernel": np.asarray(sd[f"{base}.self_attn.out_proj.weight"]).T,
                "out_bias": np.asarray(sd[f"{base}.self_attn.out_proj.bias"]),
            },
            "ffn_1": {
                "kernel": np.transpose(np.asarray(sd[f"{base}.ffn.ffn_1.weight"]), (2, 1, 0)),
                "bias": np.asarray(sd[f"{base}.ffn.ffn_1.bias"]),
            },
            "ffn_2": {"kernel": np.asarray(sd[f"{base}.ffn.ffn_2.weight"]).T,
                      "bias": np.asarray(sd[f"{base}.ffn.ffn_2.bias"])},
        }
    p["last_ln"] = {
        "scale": np.asarray(sd[f"{dot}last_ln.weight"]),
        "bias": np.asarray(sd[f"{dot}last_ln.bias"]),
    }
    return p


def ns3_decoder_prosody_params_from_torch(sd: Dict, with_speaker: bool = False) -> Dict:
    """FACodecDecoderV2 state dict → ProsodyExtractor params (prosody subset)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    in_k, in_b = _fold_wn_linear(sd, "quantizer.0.layers.0.in_proj")
    out_k, out_b = _fold_wn_linear(sd, "quantizer.0.layers.0.out_proj")
    p: Dict = {
        "melspec_linear": {
            "kernel": np.asarray(sd["melspec_linear.weight"]).T,
            "bias": np.asarray(sd["melspec_linear.bias"]),
        },
        "melspec_encoder": _ns3_transformer_params(sd, "melspec_encoder"),
        "fvq": {
            "in_kernel": in_k, "in_bias": in_b,
            "out_kernel": out_k, "out_bias": out_b,
            "codebook": np.asarray(sd["quantizer.0.layers.0._codebook.weight"]),
        },
    }
    if with_speaker:
        p["timbre_encoder"] = _ns3_transformer_params(sd, "timbre_encoder")
    return p


def ns3_encoder_params_from_torch(sd: Dict, up_ratios=(2, 4, 5, 5), ngf=32) -> Dict:
    """FACodecEncoderV2 state dict → FACodecEncoderV2Model params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: Dict = {}

    def conv(dst, prefix):
        k, b = _fold_wn_conv(sd, prefix)
        _set(p, dst + ("kernel",), k)
        _set(p, dst + ("bias",), b)

    def act(dst, prefix):
        _set(p, dst + ("alpha",), np.asarray(sd[f"{prefix}.act.alpha"]))
        _set(p, dst + ("beta",), np.asarray(sd[f"{prefix}.act.beta"]))

    def resunit(dst, prefix):
        act(dst + ("act1",), f"{prefix}.block.0")
        conv(dst + ("conv1",), f"{prefix}.block.1")
        act(dst + ("act2",), f"{prefix}.block.2")
        conv(dst + ("conv2",), f"{prefix}.block.3")

    conv(("conv_in",), "block.0")
    for i in range(len(up_ratios)):
        base = f"block.{i + 1}.block"
        dst = (f"block{i}",)
        resunit(dst + ("res1",), f"{base}.0")
        resunit(dst + ("res2",), f"{base}.1")
        resunit(dst + ("res3",), f"{base}.2")
        act(dst + ("act",), f"{base}.3")
        conv(dst + ("down",), f"{base}.4")
    act(("act_out",), f"block.{len(up_ratios) + 1}")
    conv(("conv_out",), f"block.{len(up_ratios) + 2}")
    return p


def _set(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value
