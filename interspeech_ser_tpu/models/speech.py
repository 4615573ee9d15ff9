"""Unified speech SSL encoder: WavLM / wav2vec2(XLS-R) / HuBERT on TPU.

The three HF families used by the reference's extraction scripts
(reference: preprocessing/preprocess_speech.py:111-112 loads
microsoft/wavlm-large, facebook/wav2vec2-xls-r-2b, facebook/hubert-xlarge-*
via AutoModel) share one architecture skeleton — 7-layer strided conv
frontend (hop 320 @16 kHz), feature projection, positional conv embedding,
transformer stack — differing only in attention flavor (WavLM adds gated
relative position bias), norm placement (stable vs post LN), and conv-norm
mode. This module implements that skeleton ONCE as a config-driven flax
model; checkpoint converters live in ``convert_hf.py``.

Batched-padded extraction here equals HF's per-utterance unpadded forward
exactly: padded frames are zeroed before the positional conv (mirroring the
HF encoders), excluded from attention via the key mask, and sliced off
before saving — see tests/test_speech_encoders.py.

Compute dtype is configurable: f32 for bit-parity, bf16 for MXU throughput
(params stay f32; layernorm/softmax accumulate in f32 either way).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention_core import dot_product_attention_btd


@dataclasses.dataclass(frozen=True)
class SpeechConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # 'group' (base) | 'layer' (large/XL)
    do_stable_layer_norm: bool = False
    attention_type: str = "standard"  # 'standard' | 'wavlm'
    # INFERENCE-ONLY kernels opt-in (no vjp, no GSPMD auto-partitioning):
    # extraction pipelines / benches flip this on a config copy; training
    # engines must leave it False (gradients require the XLA paths)
    inference_kernels: bool = False
    # Inference-only layout transform: one [D,3D] qkv matmul per layer
    # instead of three [D,D] ones (the activations are read from HBM once
    # instead of three times). Requires params rewritten by
    # ``fuse_qkv_params`` — checkpoints/converters always carry the split
    # q/k/v layout, so this is flipped on a config copy at load time after
    # the transform (see scripts/exp_qkv_fused.py for the measured A/B).
    fused_qkv: bool = False
    num_buckets: int = 320
    max_distance: int = 800
    num_conv_pos_embeddings: int = 128
    conv_pos_groups: int = 16
    layer_norm_eps: float = 1e-5
    dtype: str = "float32"  # compute dtype; params always f32
    # None → tanh-approx gelu iff bf16. Exact erf gelu is VPU-bound on TPU
    # (measured 8.7 ms on one [16,32k,512] tensor, ~1 ms per FFN layer); the
    # tanh form's max error (~2e-3) is below bf16 rounding (~8e-3 at |x|≈1),
    # so bf16 mode keeps cosine parity while f32 mode stays bit-exact.
    approx_gelu: Optional[bool] = None
    # Parameter-efficient finetune hooks (reference lora_wavlm/model.py:37-50:
    # 'adapter' | 'adapter_l' | 'embedding_prompt' | 'combined'; LoRA rides
    # the separate param-tree transform in models/lora.py). The reference
    # repo never defines its ``Adapter`` class (the name is unbound — those
    # branches crash if selected), so the adapter here follows the IPET
    # bottleneck design its header cites: down-proj → ReLU → zero-init
    # up-proj, scaled by ``adapter_scalar`` (output is 0 at init → the
    # wrapped model starts exactly at the pretrained function).
    finetune_method: Optional[str] = None
    adapter_hidden_dim: int = 128
    adapter_scalar: float = 0.1
    embedding_prompt_dim: int = 5

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @property
    def use_approx_gelu(self) -> bool:
        if self.approx_gelu is None:
            return self.dtype == "bfloat16"
        return self.approx_gelu

    @classmethod
    def from_hf(cls, hf_config, attention_type: Optional[str] = None, dtype: str = "float32"):
        """Build from a transformers WavLM/Wav2Vec2/Hubert config."""
        if attention_type is None:
            attention_type = "wavlm" if hf_config.model_type == "wavlm" else "standard"
        return cls(
            hidden_size=hf_config.hidden_size,
            num_layers=hf_config.num_hidden_layers,
            num_heads=hf_config.num_attention_heads,
            intermediate_size=hf_config.intermediate_size,
            conv_dim=tuple(hf_config.conv_dim),
            conv_kernel=tuple(hf_config.conv_kernel),
            conv_stride=tuple(hf_config.conv_stride),
            conv_bias=hf_config.conv_bias,
            feat_extract_norm=hf_config.feat_extract_norm,
            do_stable_layer_norm=hf_config.do_stable_layer_norm,
            attention_type=attention_type,
            num_buckets=getattr(hf_config, "num_buckets", 320),
            max_distance=getattr(hf_config, "max_bucket_distance", 800),
            num_conv_pos_embeddings=hf_config.num_conv_pos_embeddings,
            conv_pos_groups=hf_config.num_conv_pos_embedding_groups,
            layer_norm_eps=hf_config.layer_norm_eps,
            dtype=dtype,
        )


# Production presets (checkpoint card values for the reference's encoders).
def wavlm_large(dtype="float32") -> SpeechConfig:
    return SpeechConfig(
        hidden_size=1024, num_layers=24, num_heads=16, intermediate_size=4096,
        conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
        attention_type="wavlm", dtype=dtype,
    )


def wav2vec2_xlsr_2b(dtype="float32") -> SpeechConfig:
    return SpeechConfig(
        hidden_size=1920, num_layers=48, num_heads=16, intermediate_size=7680,
        conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
        attention_type="standard", dtype=dtype,
    )


def hubert_xlarge(dtype="float32") -> SpeechConfig:
    return SpeechConfig(
        hidden_size=1280, num_layers=48, num_heads=16, intermediate_size=5120,
        conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
        attention_type="standard", dtype=dtype,
    )


def feat_extract_output_length(length, config: SpeechConfig):
    """Conv-frontend output length (works on ints or arrays)."""
    for k, s in zip(config.conv_kernel, config.conv_stride):
        length = (length - k) // s + 1
    return length


class PatchMatmulConv(nn.Module):
    """VALID strided conv over a single input channel, as a patch matmul.

    Parameter layout is identical to ``nn.Conv`` (``kernel`` [k, 1, out],
    ``bias`` [out]) so checkpoint converters are unaffected; requires
    ``k % s == 0`` (WavLM/w2v2/HuBERT layer 0: k=10, s=5).

    This layout is measured ~optimal: on v5e at B=32 it runs 1.25 ms over
    the raw stream floor for its 1-GB output; a blocked-Toeplitz relayout
    (contraction 85 instead of 10, zero-padded weights) measured ~2x
    WORSE — conv0 is bandwidth- not MXU-limited, so the padding FLOPs and
    fatter weight panels only add traffic (scripts/exp_conv0_anatomy.py).
    """

    features: int
    kernel_size: int
    stride: int
    use_bias: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, L, 1]
        k, s = self.kernel_size, self.stride
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, 1, self.features),
            jnp.float32,
        )
        B, L, _ = x.shape
        t_out = (L - k) // s + 1
        n = k // s
        t0 = t_out + n - 1  # s-sized phases covering every patch
        xr = x[:, : t0 * s, 0].reshape(B, t0, s)
        patches = jnp.concatenate(
            [xr[:, j : j + t_out, :] for j in range(n)], axis=-1
        )  # [B, t_out, k]
        out = patches @ kernel.reshape(k, self.features).astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            out = out + bias.astype(self.dtype)
        return out


class _ConvParamHolder(nn.Module):
    """Declares ``nn.Conv``-layout params (kernel [k, in, out], bias [out])
    without running the conv — the fused-frontend kernel consumes them
    directly, and the param tree stays converter-identical."""

    features: int
    kernel_size: int
    in_ch: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        kern = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_ch, self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        return kern, bias


class _LNParamHolder(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,), jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32),
        )


def default_fused_frontend(cfg: "SpeechConfig") -> int:
    """Fused-frontend depth for INFERENCE construction sites.

    The fused conv-prefix Pallas kernel (ops/pallas/conv_frontend.py) has
    no vjp and doesn't partition under GSPMD, so it only auto-enables for
    single-device TPU bf16 'layer'-norm runs — SpeechExtractionPipeline
    applies this helper on its dp-only leg when the model was built with
    the default depth 0, and benches pass it explicitly; training engines
    leave the default 0. ``SER_TPU_FRONTEND=xla|<n_layers>`` overrides.
    """
    env = os.environ.get("SER_TPU_FRONTEND")
    if env is not None:
        return 0 if env == "xla" else int(env)
    # Auto default 1, measured on v5e (scripts/exp_frontend_fused.py,
    # B=32 WavLM-large bf16): e2e 294.5 utt/s at depth 1 vs 290.2 XLA /
    # 292.5 depth 2 / 289.9 depth 3 — fusing conv0+LN+GELU into one pass
    # wins ~1.5%; deeper prefixes give the win back (per-tap matmuls of
    # the 512-channel layers recompute overlapping receptive fields).
    # Depth >=7 does not compile (Mosaic); output parity at depths 1-3
    # confirmed on chip (cosine >=0.9999 vs plain bf16).
    if cfg.feat_extract_norm == "layer" and cfg.dtype == "bfloat16":
        return 1
    return 0


class ConvFeatureExtractor(nn.Module):
    """7-layer strided conv frontend (hop 320).

    'group' mode: GroupNorm(ch, ch) on layer 0 only (base models);
    'layer' mode: per-layer LayerNorm over channels (large/XL models).

    ``fused_prefix=n`` runs the first n layers as ONE Pallas pass
    (inference-only; see ops/pallas/conv_frontend.py — the [B, ~32k, 512]
    layer-0 activations never touch HBM). Param tree is identical either
    way.
    """

    config: SpeechConfig
    fused_prefix: int = 0

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:  # [B, L] -> [B, T, C]
        cfg = self.config
        dt = cfg.compute_dtype
        start = 0
        x = wav[:, :, None].astype(dt)  # [B, L, 1]
        if self.fused_prefix and cfg.feat_extract_norm == "layer":
            from ..ops.pallas.conv_frontend import fused_conv_frontend

            n_fused = min(self.fused_prefix, len(cfg.conv_dim))
            layer_params = []
            for i in range(n_fused):
                in_ch = 1 if i == 0 else cfg.conv_dim[i - 1]
                kern, bias = _ConvParamHolder(
                    cfg.conv_dim[i], cfg.conv_kernel[i], in_ch, cfg.conv_bias,
                    name=f"conv{i}",
                )()
                ln_s, ln_b = _LNParamHolder(cfg.conv_dim[i], name=f"conv_ln{i}")()
                p = {"kernel": kern, "ln_scale": ln_s, "ln_bias": ln_b}
                if bias is not None:
                    p["bias"] = bias
                layer_params.append(p)
            x = fused_conv_frontend(
                wav, layer_params, cfg.conv_kernel, cfg.conv_stride, dt,
                cfg.use_approx_gelu, eps=cfg.layer_norm_eps,
            )
            start = n_fused
        for i, (out_ch, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            if i < start:
                continue
            if i == 0 and x.shape[-1] == 1 and k % s == 0:
                # XLA's C_in=1 conv is layout-bound (measured 3.9 ms for
                # 5.2 GF on v5e); the same op as a strided-patch matmul runs
                # on the MXU. Identical math: out[t] = ⟨wav[st:st+k], W⟩.
                x = PatchMatmulConv(
                    out_ch, k, s, cfg.conv_bias, dt, name=f"conv{i}"
                )(x)
            else:
                x = nn.Conv(
                    out_ch, (k,), strides=(s,), padding="VALID", use_bias=cfg.conv_bias,
                    dtype=dt, param_dtype=jnp.float32, name=f"conv{i}",
                )(x)
            # inter-layer norms stay f32: a bf16-normalize variant was
            # measured DEAD EVEN (scripts/exp_convln.py — frontend 23.63
            # vs 23.52 ms, e2e 286.7 vs 286.5 utt/s, B=32) because XLA
            # already fuses the f32 LN round-trip into the conv epilogue;
            # keep the numerically-wider form since it costs nothing
            if cfg.feat_extract_norm == "group" and i == 0:
                x = nn.GroupNorm(
                    num_groups=out_ch, epsilon=1e-5, dtype=jnp.float32,
                    param_dtype=jnp.float32, name="group_norm",
                )(x).astype(dt)
            elif cfg.feat_extract_norm == "layer":
                x = nn.LayerNorm(
                    epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                    param_dtype=jnp.float32, name=f"conv_ln{i}",
                )(x).astype(dt)
            x = nn.gelu(x, approximate=cfg.use_approx_gelu)
        return x


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding (k=128, groups=16, gelu).

    The torch original weight-norms the conv kernel; the converter folds
    g·v/||v|| into a plain kernel (the parametrization only matters for
    from-scratch training dynamics, not inference parity).
    """

    config: SpeechConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, D]
        cfg = self.config
        k = cfg.num_conv_pos_embeddings
        h = nn.Conv(
            cfg.hidden_size, (k,), padding=[(k // 2, k // 2)],
            feature_group_count=cfg.conv_pos_groups, dtype=cfg.compute_dtype,
            param_dtype=jnp.float32, name="conv",
        )(x)
        if k % 2 == 0:  # SamePadLayer: drop trailing element for even kernels
            h = h[:, :-1, :]
        return nn.gelu(h, approximate=cfg.use_approx_gelu)


def _relative_position_buckets(tq: int, tk: int, num_buckets: int, max_distance: int):
    """WavLM bucketed relative positions (T5-style, bidirectional).

    Math follows the public WavLM formulation (see HF
    modeling_wavlm.WavLMAttention._relative_positions_bucket); computed in
    numpy at trace time — static shapes, no device work.
    """
    context = np.arange(tq)[:, None]
    memory = np.arange(tk)[None, :]
    relative = memory - context
    nb = num_buckets // 2
    buckets = (relative > 0).astype(np.int64) * nb
    rel_abs = np.abs(relative)
    max_exact = nb // 2
    is_small = rel_abs < max_exact
    with np.errstate(divide="ignore"):
        large = (
            max_exact
            + (
                np.log(np.maximum(rel_abs, 1) / max_exact)
                / np.log(max_distance / max_exact)
                * (nb - max_exact)
            ).astype(np.int64)
        )
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel_abs, large)
    return jnp.asarray(buckets)


def _proj_dense(cfg: SpeechConfig, features: int, name: str):
    """Projection Dense. (An experimental W8A8 int8 variant lived here
    through r02; it measured 0.80x bf16 at extraction shapes — dynamic
    per-row activation quant is VPU-bound — and was removed. The decisive
    microbench is kept at scripts/exp_int8_matmul.py.)"""
    return nn.Dense(
        features, dtype=cfg.compute_dtype, param_dtype=jnp.float32, name=name
    )


class SpeechSelfAttention(nn.Module):
    """Self-attention; WavLM flavor adds the gated relative position bias."""

    config: SpeechConfig
    has_relative_position_bias: bool = False  # rel embedding lives on layer 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        key_mask: Optional[jnp.ndarray],
        position_bias: Optional[jnp.ndarray],  # [H, T, T] from layer 0
    ):
        cfg = self.config
        D, H = cfg.hidden_size, cfg.num_heads
        hd = D // H
        dt = cfg.compute_dtype
        B, T, _ = x.shape

        # projections stay in [B, T, D]; head split happens inside the
        # attention core (the oneshot2 kernel slices head columns via its
        # BlockSpec index map, other impls transpose and XLA fuses it)
        if cfg.fused_qkv:
            qkv = _proj_dense(cfg, 3 * D, "qkv_proj")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = _proj_dense(cfg, D, "q_proj")(x)
            k = _proj_dense(cfg, D, "k_proj")(x)
            v = _proj_dense(cfg, D, "v_proj")(x)

        gate_out = None
        if cfg.attention_type == "wavlm":
            if self.has_relative_position_bias:
                rel_embed = self.param(
                    "rel_attn_embed",
                    nn.initializers.normal(0.02),
                    (cfg.num_buckets, H),
                    jnp.float32,
                )
                buckets = _relative_position_buckets(
                    T, T, cfg.num_buckets, cfg.max_distance
                )
                position_bias = rel_embed[buckets].transpose(2, 0, 1)  # [H, T, T]
            assert position_bias is not None, "layers >0 need layer-0 position_bias"
            # gated bias: per-(batch, head, query) gate from the hidden state
            # (computed in the compute dtype; f32 mode stays exact)
            gate_in = x.reshape(B, T, H, hd).transpose(0, 2, 1, 3)  # [B,H,T,hd]
            proj = nn.Dense(
                8, dtype=dt, param_dtype=jnp.float32, name="gru_rel_pos_linear"
            )(gate_in)
            proj = proj.astype(jnp.float32).reshape(B, H, T, 2, 4).sum(-1)  # [B,H,T,2]
            gates = jax.nn.sigmoid(proj)
            gate_a, gate_b = gates[..., 0:1], gates[..., 1:2]  # [B,H,T,1]
            const = self.param(
                "gru_rel_pos_const", nn.initializers.ones, (1, H, 1, 1), jnp.float32
            )
            gate_out = (gate_a * (gate_b * const - 1.0) + 2.0)[..., 0]  # [B,H,T]

        # bias stays FACTORED (gate · pos_bias): the flash kernel streams it
        # tile-by-tile instead of materializing [B,H,T,T] in HBM
        out = dot_product_attention_btd(
            q, k, v, H, key_mask=key_mask, gate=gate_out,
            shared_bias=position_bias if cfg.attention_type == "wavlm" else None,
            allow_kernel=cfg.inference_kernels,
        )
        out = _proj_dense(cfg, D, "out_proj")(out)
        return out, position_bias


class _DenseParams(nn.Module):
    """Params-only stand-in for nn.Dense: same tree path, shapes, init
    (lecun_normal kernel / zeros bias, f32) — lets the fused-FFN kernel
    path read raw weights without a throwaway Dense call, and keeps
    checkpoints interchangeable between the XLA and kernel paths."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


class FeedForward(nn.Module):
    config: SpeechConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dt = cfg.compute_dtype
        # SER_TPU_FFN_KERNEL=1: single-kernel MLP pair with the [.,4096]
        # intermediate VMEM-resident (ops/pallas/ffn_fused.py). No vjp →
        # inference opt-in only, gated like the other kernels; A/B in
        # scripts/exp_ffn_fused.py decides whether it ever defaults.
        if (
            os.environ.get("SER_TPU_FFN_KERNEL") == "1"
            and cfg.inference_kernels
            and x.ndim == 3
        ):
            from ..ops.pallas.ffn_fused import ffn_fused

            D = x.shape[-1]
            wu, bu = _DenseParams(D, cfg.intermediate_size, name="intermediate_dense")()
            wd, bd = _DenseParams(cfg.intermediate_size, D, name="output_dense")()
            out = ffn_fused(
                x.astype(dt).reshape(-1, D), wu.astype(dt), bu,
                wd.astype(dt), bd, approx_gelu=cfg.use_approx_gelu,
                interpret=jax.devices()[0].platform != "tpu",
            )
            return out.reshape(x.shape)
        h = _proj_dense(cfg, cfg.intermediate_size, "intermediate_dense")(x)
        h = nn.gelu(h, approximate=cfg.use_approx_gelu)
        return _proj_dense(cfg, cfg.hidden_size, "output_dense")(h)


class Adapter(nn.Module):
    """IPET-style bottleneck adapter (see SpeechConfig.finetune_method)."""

    hidden_size: int
    bottleneck: int
    scalar: float = 0.1

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.bottleneck, name="down")(x)
        h = nn.relu(h)
        h = nn.Dense(
            self.hidden_size, kernel_init=nn.initializers.zeros, name="up"
        )(h)
        return self.scalar * h


class EncoderLayer(nn.Module):
    config: SpeechConfig
    has_relative_position_bias: bool = False

    @nn.compact
    def __call__(self, x, key_mask, position_bias):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32,
            name=name,
        )
        attn = SpeechSelfAttention(
            cfg, self.has_relative_position_bias, name="attention"
        )
        ffn = FeedForward(cfg, name="feed_forward")
        dt = cfg.compute_dtype
        ft = cfg.finetune_method
        use_prompt = ft in ("embedding_prompt", "combined")
        adapter = None
        if ft in ("adapter", "adapter_l", "combined"):
            adapter = Adapter(
                cfg.hidden_size, cfg.adapter_hidden_dim, cfg.adapter_scalar,
                name="adapter",
            )

        if use_prompt:
            # per-layer learned prompt tokens, prepended before attention and
            # stripped after the layer (reference lora_wavlm/model.py:53-55,79-80)
            P = cfg.embedding_prompt_dim
            prompt = self.param(
                "embed_prompt", nn.initializers.xavier_uniform(),
                (1, P, cfg.hidden_size), jnp.float32,
            )
            B = x.shape[0]
            x = jnp.concatenate(
                [jnp.broadcast_to(prompt.astype(x.dtype), (B, P, cfg.hidden_size)), x],
                axis=1,
            )
            if key_mask is not None:
                key_mask = jnp.concatenate(
                    [jnp.ones((B, P), key_mask.dtype), key_mask], axis=1
                )

        if cfg.do_stable_layer_norm:  # pre-LN (large/XL checkpoints)
            h, position_bias = attn(ln("layer_norm")(x).astype(dt), key_mask, position_bias)
            x = x + h
            if ft == "adapter":
                adapt_h = adapter(x)
            x = x + ffn(ln("final_layer_norm")(x).astype(dt))
            if ft == "adapter":
                x = x + adapt_h
            if ft in ("adapter_l", "combined"):
                x = x + adapter(x)
        else:  # post-LN (base checkpoints; reference layer structure)
            h, position_bias = attn(x, key_mask, position_bias)
            x_res = x + h
            if ft == "adapter":
                adapt_h = adapter(x_res)
            x = ln("layer_norm")(x_res).astype(dt)
            x = x + ffn(x)
            if ft == "adapter":
                x = x + adapt_h
            if ft in ("adapter_l", "combined"):
                x = x + adapter(x)
            x = ln("final_layer_norm")(x).astype(dt)

        if use_prompt:
            x = x[:, cfg.embedding_prompt_dim :, :]
        return x, position_bias


class SpeechEncoderModel(nn.Module):
    """Full model: wav → conv frontend → projection → transformer stack.

    Returns a dict with ``hidden_states`` (num_layers+1 entries, HF
    indexing: [0] = post-positional-conv embeddings, [i] = layer i-1 output,
    final entry carries the closing LayerNorm for stable-LN models),
    ``last_hidden_state`` and the frame-level ``frame_mask``.
    """

    config: SpeechConfig
    fused_frontend: int = 0  # inference-only Pallas conv-prefix depth

    @nn.compact
    def __call__(
        self,
        wav: jnp.ndarray,  # [B, L] (already feature-extractor-normalized)
        wav_mask: Optional[jnp.ndarray] = None,  # [B, L], 1 = valid sample
        freeze_feature_extractor: bool = False,
    ):
        cfg = self.config
        dt = cfg.compute_dtype
        feats = ConvFeatureExtractor(
            cfg, fused_prefix=self.fused_frontend, name="feature_extractor"
        )(wav)
        if freeze_feature_extractor:
            # HF freeze_feature_encoder semantics: no grads reach the conv
            # frontend; the stop_gradient also lets XLA prune its entire
            # backward pass (optimizer-side zeroing alone still computes it)
            feats = jax.lax.stop_gradient(feats)
        B, T, _ = feats.shape

        if wav_mask is not None:
            lengths = feat_extract_output_length(
                wav_mask.sum(axis=-1).astype(jnp.int32), cfg
            )
            frame_mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(jnp.float32)
        else:
            frame_mask = jnp.ones((B, T), jnp.float32)

        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32,
            name="fp_layer_norm",
        )(feats).astype(dt)
        h = nn.Dense(
            cfg.hidden_size, dtype=dt, param_dtype=jnp.float32, name="fp_projection"
        )(h)

        # zero padded frames before the positional conv (HF semantics)
        h = h * frame_mask[:, :, None].astype(dt)
        h = h + PositionalConvEmbedding(cfg, name="pos_conv_embed")(h)
        if not cfg.do_stable_layer_norm:
            h = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32,
                name="encoder_layer_norm",
            )(h).astype(dt)

        hidden_states: List[jnp.ndarray] = [h]
        position_bias = None
        for i in range(cfg.num_layers):
            h, position_bias = EncoderLayer(
                cfg, has_relative_position_bias=(i == 0), name=f"layer{i}"
            )(h, frame_mask, position_bias)
            hidden_states.append(h)

        if cfg.do_stable_layer_norm:
            h = nn.LayerNorm(
                epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32,
                name="encoder_layer_norm",
            )(h).astype(dt)
            hidden_states[-1] = h

        return {
            "last_hidden_state": h,
            "hidden_states": hidden_states,
            "frame_mask": frame_mask,
        }


def fuse_qkv_params(params):
    """Rewrite split q/k/v projection params into the fused qkv layout.

    Returns a NEW param tree whose per-layer ``attention`` carries one
    ``qkv_proj`` ([D, 3D] kernel / [3D] bias, column order q|k|v matching
    the ``jnp.split`` in ``SpeechSelfAttention``) in place of
    ``{q,k,v}_proj``. Exact relayout — no numerics change; pair with
    ``dataclasses.replace(cfg, fused_qkv=True)``.
    """
    out = {}
    for name, sub in params.items():
        if name.startswith("layer") and "attention" in sub:
            attn = dict(sub["attention"])
            if all(p in attn for p in ("q_proj", "k_proj", "v_proj")):
                parts = [attn.pop(p) for p in ("q_proj", "k_proj", "v_proj")]
                qkv = {
                    "kernel": jnp.concatenate([p["kernel"] for p in parts], axis=1)
                }
                if "bias" in parts[0]:
                    qkv["bias"] = jnp.concatenate([p["bias"] for p in parts])
                attn["qkv_proj"] = qkv
            sub = {**sub, "attention": attn}
        out[name] = sub
    return out
