"""Golden parity for the NS3 FACodec prosody path.

The reference's ns3 package can't be imported here (pyworld/librosa/
torchaudio absent), so the torch side is rebuilt from primitives with the
reference's exact math and state-dict naming (weight-normed convs/linears,
SnakeBeta, kaiser-sinc alias-free resampling, conv-FFN transformer with the
per-batch-index PE quirk, factorized VQ) and compared against the JAX port.
"""

import math
import os
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.models.ns3 import facodec as ns3

RNG = np.random.default_rng(13)


# -- torch reference pieces (reference math, fresh implementation) ----------


def torch_kaiser_sinc(cutoff, half_width, kernel_size):
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    beta = 0.1102 * (A - 8.7) if A > 50 else (
        0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21) if A >= 21 else 0.0
    )
    window = torch.kaiser_window(kernel_size, beta=beta, periodic=False)
    time = (torch.arange(-half_size, half_size) + 0.5) if even else (
        torch.arange(kernel_size) - half_size
    )
    filt = 2 * cutoff * window * torch.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.view(1, 1, kernel_size)


class TorchSnakeAct(nn.Module):
    """Activation1d(SnakeBeta(C, alpha_logscale=True)) — reference math."""

    def __init__(self, channels):
        super().__init__()
        self.act = nn.Module()
        self.act.alpha = nn.Parameter(torch.zeros(channels))
        self.act.beta = nn.Parameter(torch.zeros(channels))
        self.register_buffer("up_filter", torch_kaiser_sinc(0.25, 0.3, 12))
        self.register_buffer("down_filter", torch_kaiser_sinc(0.25, 0.3, 12))

    def forward(self, x):  # [B, C, T]
        C = x.shape[1]
        # UpSample1d(2, 12)
        pad = 12 // 2 - 1
        h = F.pad(x, (pad, pad), mode="replicate")
        h = 2 * F.conv_transpose1d(h, self.up_filter.expand(C, -1, -1), stride=2, groups=C)
        pl = pad * 2 + (12 - 2) // 2
        pr = pad * 2 + (12 - 2 + 1) // 2
        h = h[..., pl:-pr]
        # SnakeBeta (logscale)
        a = torch.exp(self.act.alpha)[None, :, None]
        b = torch.exp(self.act.beta)[None, :, None]
        h = h + (1.0 / (b + 1e-9)) * torch.sin(h * a) ** 2
        # DownSample1d(2, 12)
        h = F.pad(h, (12 // 2 - 1, 12 // 2), mode="replicate")
        return F.conv1d(h, self.down_filter.expand(C, -1, -1), stride=2, groups=C)


def wn_conv(in_ch, out_ch, k, **kw):
    return torch.nn.utils.weight_norm(nn.Conv1d(in_ch, out_ch, k, **kw))


class TorchResidualUnit(nn.Module):
    def __init__(self, dim, dilation):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = nn.Sequential(
            TorchSnakeAct(dim),
            wn_conv(dim, dim, 7, dilation=dilation, padding=pad),
            TorchSnakeAct(dim),
            wn_conv(dim, dim, 1),
        )

    def forward(self, x):
        return x + self.block(x)


class TorchEncoderV2(nn.Module):
    """FACodecEncoderV2 conv stack with reference naming (facodec.py:767-811)."""

    def __init__(self, ngf=8, up_ratios=(2, 4), out_channels=16):
        super().__init__()
        d = ngf
        block = [wn_conv(1, d, 7, padding=3)]
        for stride in up_ratios:
            d *= 2
            block.append(
                nn.Sequential(
                    TorchResidualUnit(d // 2, 1),
                    TorchResidualUnit(d // 2, 3),
                    TorchResidualUnit(d // 2, 9),
                    TorchSnakeAct(d // 2),
                    wn_conv(d // 2, d, 2 * stride, stride=stride,
                            padding=stride // 2 + stride % 2),
                )
            )
        block += [TorchSnakeAct(d), wn_conv(d, out_channels, 3, padding=1)]
        self.block = nn.Sequential(*block)

    def forward(self, x):
        return self.block(x)


def _rename_encoder_sd(model):
    """Map the test module's names to the reference's flat naming."""
    sd = {}
    for k, v in model.state_dict().items():
        k = k.replace(".block.0.act.", ".0.act.") if False else k
        sd[k] = v.numpy()
    # our TorchEncoderV2 uses nn.Sequential exactly like the reference, but
    # the EncoderBlock level in the reference nests one extra .block
    out = {}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[0] == "block" and parts[1] not in ("0",) and not parts[1].isdigit():
            out[k] = v
            continue
        if parts[0] == "block" and parts[1].isdigit() and int(parts[1]) not in (0, len(model.block) - 2, len(model.block) - 1):
            # encoder blocks: block.{i} (Sequential) → block.{i}.block.{j}
            k = "block." + parts[1] + ".block." + ".".join(parts[2:])
        out[k] = v
    return out


class TorchNS3Transformer(nn.Module):
    """4-layer NS3 transformer with PE quirk (reference transformer.py)."""

    def __init__(self, hidden=32, heads=4, layers=2, filt=64, k=5, max_len=100):
        super().__init__()
        position = torch.arange(max_len).unsqueeze(1)
        div = torch.exp(torch.arange(0, hidden, 2) * (-math.log(10000.0) / hidden))
        pe = torch.zeros(max_len, 1, hidden)
        pe[:, 0, 0::2] = torch.sin(position * div)
        pe[:, 0, 1::2] = torch.cos(position * div)
        self.register_buffer("pe", pe)
        self.layers = nn.ModuleList()
        for _ in range(layers):
            layer = nn.Module()
            layer.ln_1 = nn.LayerNorm(hidden)
            layer.ln_2 = nn.LayerNorm(hidden)
            layer.self_attn = nn.MultiheadAttention(hidden, heads, batch_first=True)
            layer.ffn = nn.Module()
            layer.ffn.ffn_1 = nn.Conv1d(hidden, filt, k, padding=k // 2)
            layer.ffn.ffn_2 = nn.Linear(filt, hidden)
            self.layers.append(layer)
        self.last_ln = nn.LayerNorm(hidden)

    def forward(self, x):
        x = x + self.pe[: x.size(0)]  # the quirk: pe[batch] broadcast over T
        for l in self.layers:
            r = x
            h = l.ln_1(x)
            h, _ = l.self_attn(h, h, h)
            x = r + h
            r = x
            h = l.ln_2(x)
            h = l.ffn.ffn_1(h.permute(0, 2, 1)).permute(0, 2, 1)
            h = F.relu(h)
            x = r + l.ffn.ffn_2(h)
        return self.last_ln(x)


# -- tests -------------------------------------------------------------------


class TestKaiserFilter:
    def test_matches_torch(self):
        ours = ns3.kaiser_sinc_filter1d(0.25, 0.3, 12)
        ref = torch_kaiser_sinc(0.25, 0.3, 12).numpy()[0, 0]
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestNS3Mel:
    def test_matches_torch_stft(self):
        from interspeech_ser_tpu.ops.mel import mel_filter_bank_slaney

        wav = (RNG.normal(size=2000) * 0.1).astype(np.float32)
        wav = np.pad(wav, (0, 200 - len(wav) % 200))
        ours = np.asarray(ns3.ns3_mel_spectrogram(jnp.asarray(wav[None])))[0]

        y = torch.tensor(wav)[None]
        y = F.pad(y.unsqueeze(1), (412, 412), mode="reflect").squeeze(1)
        spec = torch.stft(
            y, 1024, hop_length=200, win_length=800,
            window=torch.hann_window(800), center=False, pad_mode="reflect",
            normalized=False, onesided=True, return_complex=True,
        )
        spec = torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + 1e-9)
        mel_fb = torch.tensor(mel_filter_bank_slaney(513, 80, 0.0, 8000.0, 16000).T)
        ref = torch.log(torch.clamp(mel_fb @ spec[0], min=1e-5)).numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4)


class TestSnakeActivation:
    def test_matches_torch(self):
        C, T = 6, 50
        tm = TorchSnakeAct(C)
        with torch.no_grad():
            tm.act.alpha.copy_(torch.tensor(RNG.normal(size=C).astype(np.float32)))
            tm.act.beta.copy_(torch.tensor(RNG.normal(size=C).astype(np.float32)))
        x = RNG.normal(size=(2, C, T)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(x)).numpy()
        model = ns3.SnakeAct1d(C)
        params = {
            "alpha": np.asarray(tm.act.alpha.detach()),
            "beta": np.asarray(tm.act.beta.detach()),
        }
        ours = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 2, 1), ref, atol=2e-5
        )


class TestEncoderConvStack:
    def test_matches_torch(self):
        torch.manual_seed(8)
        tm = TorchEncoderV2(ngf=8, up_ratios=(2, 4), out_channels=16)
        tm.eval()
        sd = _rename_encoder_sd(tm)
        params = ns3.ns3_encoder_params_from_torch(sd, up_ratios=(2, 4), ngf=8)
        model = ns3.FACodecEncoderV2Model(ngf=8, up_ratios=(2, 4), out_channels=16)
        wav = (RNG.normal(size=(2, 400)) * 0.1).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(wav)[:, None, :]).numpy()  # [B, C, T]
        ours = np.asarray(model.apply({"params": params}, jnp.asarray(wav)))
        np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=3e-5)


class TestNS3Transformer:
    def test_matches_torch_including_pe_quirk(self):
        torch.manual_seed(9)
        tm = TorchNS3Transformer(hidden=32, heads=4, layers=2, filt=64)
        tm.eval()
        sd = {k: v.numpy() for k, v in tm.state_dict().items()}
        params = ns3._ns3_transformer_params(sd, "", layers=2)
        model = ns3.NS3TransformerEncoder(hidden=32, heads=4, layers=2, filter_size=64)
        x = RNG.normal(size=(3, 20, 32)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.tensor(x)).numpy()
        ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=3e-5)


class TestFVQ:
    def test_matches_torch_decode(self):
        torch.manual_seed(10)
        D, d, N, B, T = 16, 4, 32, 2, 11
        in_proj = torch.nn.utils.weight_norm(nn.Linear(D, d))
        out_proj = torch.nn.utils.weight_norm(nn.Linear(d, D))
        codebook = nn.Embedding(N, d)
        z = RNG.normal(size=(B, T, D)).astype(np.float32)
        with torch.no_grad():
            z_e = in_proj(torch.tensor(z))  # [B, T, d]
            enc = F.normalize(z_e.reshape(-1, d))
            cb = F.normalize(codebook.weight)
            dist = (
                enc.pow(2).sum(1, keepdim=True) - 2 * enc @ cb.t()
                + cb.pow(2).sum(1, keepdim=True).t()
            )
            idx = (-dist).max(1)[1].reshape(B, T)
            z_q = codebook(idx)
            ref = out_proj(z_q).numpy()

        sd = {
            "q.in_proj.weight_g": in_proj.weight_g.detach().numpy(),
            "q.in_proj.weight_v": in_proj.weight_v.detach().numpy(),
            "q.in_proj.bias": in_proj.bias.detach().numpy(),
            "q.out_proj.weight_g": out_proj.weight_g.detach().numpy(),
            "q.out_proj.weight_v": out_proj.weight_v.detach().numpy(),
            "q.out_proj.bias": out_proj.bias.detach().numpy(),
        }
        in_k, in_b = ns3._fold_wn_linear(sd, "q.in_proj")
        out_k, out_b = ns3._fold_wn_linear(sd, "q.out_proj")
        ours, our_idx = ns3.fvq_forward(
            jnp.asarray(z), jnp.asarray(in_k), jnp.asarray(in_b),
            jnp.asarray(out_k), jnp.asarray(out_b),
            jnp.asarray(codebook.weight.detach().numpy()),
        )
        np.testing.assert_array_equal(np.asarray(our_idx), idx.numpy())
        np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


class TestBatchedEqualsSingle:
    def test_prosody_extract_batched(self):
        """extract_batched == per-utterance __call__ (reference batch-1)."""
        torch.manual_seed(11)
        hidden = 256
        # random prosody-path params at production dims
        import jax

        key = jax.random.PRNGKey(0)
        mel_enc = ns3.NS3TransformerEncoder()
        mel_params = mel_enc.init(key, jnp.zeros((1, 8, hidden)))["params"]
        params = {
            "melspec_linear": {
                "kernel": RNG.normal(size=(20, hidden)).astype(np.float32) * 0.1,
                "bias": np.zeros(hidden, np.float32),
            },
            "melspec_encoder": mel_params,
            "fvq": {
                "in_kernel": RNG.normal(size=(hidden, 8)).astype(np.float32) * 0.1,
                "in_bias": np.zeros(8, np.float32),
                "out_kernel": RNG.normal(size=(8, hidden)).astype(np.float32) * 0.1,
                "out_bias": np.zeros(hidden, np.float32),
                "codebook": RNG.normal(size=(1024, 8)).astype(np.float32),
            },
        }
        ex = ns3.ProsodyExtractor(params)
        lengths = [1800, 3000]
        padded = [np.pad((RNG.normal(size=l) * 0.1).astype(np.float32),
                         (0, 200 - l % 200)) for l in lengths]
        singles = [np.asarray(ex(jnp.asarray(w[None])))[0] for w in padded]

        Lb = max(len(w) for w in padded)
        wav = np.zeros((2, Lb), np.float32)
        refl = np.zeros((2, Lb + 824), np.float32)
        frames = [len(w) // 200 for w in padded]
        Tb = Lb // 200
        fmask = np.zeros((2, Tb), np.float32)
        for i, w in enumerate(padded):
            wav[i, : len(w)] = w
            refl[i, : len(w) + 824] = np.pad(w, (412, 412), mode="reflect")
            fmask[i, : frames[i]] = 1
        batched = np.asarray(ex.extract_batched(
            jnp.asarray(wav), jnp.asarray(refl), jnp.asarray(fmask)
        ))
        for i in range(2):
            np.testing.assert_allclose(
                batched[i, : frames[i]], singles[i], atol=3e-4
            )


class TestSpeakerTailExact:
    def test_speaker_batched_tail_matches_single(self):
        """Speaker-variant extract_batched == per-utterance __call__ on ALL
        frames (the tail-window correction removes the bucket-edge
        deviation for utterances >= TAIL_WINDOW_FRAMES)."""
        import jax

        hidden = 256
        key = jax.random.PRNGKey(3)
        mel_enc = ns3.NS3TransformerEncoder()
        mel_params = mel_enc.init(key, jnp.zeros((1, 8, hidden)))["params"]
        enc_model = ns3.FACodecEncoderV2Model()
        enc_params = enc_model.init(key, jnp.zeros((1, 400)))["params"]
        timbre_params = mel_enc.init(key, jnp.zeros((1, 8, hidden)))["params"]
        params = {
            "melspec_linear": {
                "kernel": RNG.normal(size=(20, hidden)).astype(np.float32) * 0.1,
                "bias": np.zeros(hidden, np.float32),
            },
            "melspec_encoder": mel_params,
            "fvq": {
                "in_kernel": RNG.normal(size=(hidden, 8)).astype(np.float32) * 0.1,
                "in_bias": np.zeros(8, np.float32),
                "out_kernel": RNG.normal(size=(8, hidden)).astype(np.float32) * 0.1,
                "out_bias": np.zeros(hidden, np.float32),
                "codebook": RNG.normal(size=(1024, 8)).astype(np.float32),
            },
            "encoder": enc_params,
            "timbre_encoder": timbre_params,
        }
        ex = ns3.ProsodyExtractor(params, with_speaker=True, tail_exact=True)
        # >= TAIL_WINDOW_FRAMES (96) frames each; different bucket padding
        lengths = [20000, 21400]
        padded = [np.pad((RNG.normal(size=l) * 0.1).astype(np.float32),
                         (0, (200 - l % 200) % 200)) for l in lengths]
        singles = [np.asarray(ex(jnp.asarray(w[None])))[0] for w in padded]

        Lb = max(len(w) for w in padded)
        wav = np.zeros((2, Lb), np.float32)
        refl = np.zeros((2, Lb + 824), np.float32)
        frames = [len(w) // 200 for w in padded]
        fmask = np.zeros((2, Lb // 200), np.float32)
        for i, w in enumerate(padded):
            wav[i, : len(w)] = w
            refl[i, : len(w) + 824] = np.pad(w, (412, 412), mode="reflect")
            fmask[i, : frames[i]] = 1
        batched = np.asarray(ex.extract_batched(
            jnp.asarray(wav), jnp.asarray(refl), jnp.asarray(fmask)
        ))
        for i in range(2):
            np.testing.assert_allclose(
                batched[i, : frames[i]], singles[i], atol=3e-4
            )
        # without the correction, the tail frames must actually deviate —
        # guards against the test passing vacuously
        ex_off = ns3.ProsodyExtractor(params, with_speaker=True, tail_exact=False)
        b_off = np.asarray(ex_off.extract_batched(
            jnp.asarray(wav), jnp.asarray(refl), jnp.asarray(fmask)
        ))
        tail_err = np.abs(b_off[0, frames[0] - 3 : frames[0]] - singles[0][-3:]).max()
        assert tail_err > 3e-4
