"""Whisper encoder (large-v3) on TPU.

The reference dumps Whisper-large-v3 **encoder-only** hidden states per
utterance (reference: preprocessing/preprocess_whisper.py:57-76: 30-s padded
log-mel → ``model.encoder(...)`` → layer select → truncate to
``ceil(len(y)/320)`` frames). This module is that encoder, TPU-native:
conv1(k3,s1) → gelu → conv2(k3,s2) → gelu → +sinusoidal positions →
pre-LN transformer stack (k_proj bias-less) → final LayerNorm. The log-mel
frontend lives in ops/mel.py and runs on-device as part of the same jit.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention_core import dot_product_attention_btd


@dataclasses.dataclass(frozen=True)
class WhisperEncoderConfig:
    num_mel_bins: int = 128
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    max_source_positions: int = 1500
    layer_norm_eps: float = 1e-5
    dtype: str = "float32"
    # inference-only Pallas attention opt-in (no vjp) — see SpeechConfig
    inference_kernels: bool = False
    # TRAINING Pallas attention opt-in: the differentiable custom_vjp
    # pair (ops/pallas/attention_bwd.py). Measured 1.279x vs XLA autodiff
    # on a whisper-encoder fine-tune step (scripts/exp_attn_bwd.py, v5e
    # bf16, B4/T1500); training engines (LoRAFTEngine) flip it on.
    train_kernels: bool = False
    # inference-only fused [D,3D] qkv layout; requires params rewritten by
    # ``fuse_qkv_params_whisper`` (k_proj is bias-less in whisper — the
    # fused bias carries zeros in the k slice, which is exact)
    fused_qkv: bool = False

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32

    @classmethod
    def from_hf(cls, hf_config, dtype: str = "float32"):
        return cls(
            num_mel_bins=hf_config.num_mel_bins,
            d_model=hf_config.d_model,
            encoder_layers=hf_config.encoder_layers,
            encoder_attention_heads=hf_config.encoder_attention_heads,
            encoder_ffn_dim=hf_config.encoder_ffn_dim,
            max_source_positions=hf_config.max_source_positions,
            dtype=dtype,
        )


def whisper_large_v3(dtype: str = "float32") -> WhisperEncoderConfig:
    return WhisperEncoderConfig(dtype=dtype)


def sinusoidal_positions(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoid table (also the init of embed_positions)."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


class _WhisperAttention(nn.Module):
    config: WhisperEncoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        D, H = cfg.d_model, cfg.encoder_attention_heads
        hd = D // H
        dt = cfg.compute_dtype
        B, T, _ = x.shape
        if cfg.fused_qkv:
            qkv = nn.Dense(
                3 * D, dtype=dt, param_dtype=jnp.float32, name="qkv_proj"
            )(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(D, dtype=dt, param_dtype=jnp.float32, name="q_proj")(x)
            k = nn.Dense(D, use_bias=False, dtype=dt, param_dtype=jnp.float32, name="k_proj")(x)
            v = nn.Dense(D, dtype=dt, param_dtype=jnp.float32, name="v_proj")(x)
        # head split happens inside the attention core ([B,T,D] entry —
        # the oneshot2 kernel consumes projection layout directly)
        out = dot_product_attention_btd(
            q, k, v, H, allow_kernel=cfg.inference_kernels,
            allow_train_kernel=cfg.train_kernels,
        )
        return nn.Dense(D, dtype=dt, param_dtype=jnp.float32, name="out_proj")(out)


class _WhisperLayer(nn.Module):
    config: WhisperEncoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dt = cfg.compute_dtype
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32, name=name
        )
        x = x + _WhisperAttention(cfg, name="self_attn")(ln("self_attn_layer_norm")(x).astype(dt))
        h = ln("final_layer_norm")(x).astype(dt)
        h = nn.Dense(cfg.encoder_ffn_dim, dtype=dt, param_dtype=jnp.float32, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.d_model, dtype=dt, param_dtype=jnp.float32, name="fc2")(h)
        return x + h


class WhisperEncoderModel(nn.Module):
    """mel [B, num_mels, 3000] → hidden states (encoder_layers+1 entries)."""

    config: WhisperEncoderConfig

    @nn.compact
    def __call__(self, input_features: jnp.ndarray):
        cfg = self.config
        dt = cfg.compute_dtype
        x = jnp.transpose(input_features, (0, 2, 1)).astype(dt)  # [B, T_mel, M]
        x = nn.Conv(
            cfg.d_model, (3,), padding=[(1, 1)], dtype=dt, param_dtype=jnp.float32,
            name="conv1",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(
            cfg.d_model, (3,), strides=(2,), padding=[(1, 1)], dtype=dt,
            param_dtype=jnp.float32, name="conv2",
        )(x)
        x = nn.gelu(x, approximate=False)  # [B, 1500, D]

        # embed_positions ships inside checkpoints (sinusoid-initialized,
        # frozen); kept as a parameter for exact conversion.
        pos = self.param(
            "embed_positions",
            lambda key, shape: jnp.asarray(
                sinusoidal_positions(cfg.max_source_positions, cfg.d_model)
            ),
            (cfg.max_source_positions, cfg.d_model),
        )
        h = x + pos[None, : x.shape[1]].astype(dt)

        hidden_states: List[jnp.ndarray] = [h]
        for i in range(cfg.encoder_layers):
            h = _WhisperLayer(cfg, name=f"layer{i}")(h)
            hidden_states.append(h)
        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, param_dtype=jnp.float32,
            name="layer_norm",
        )(h).astype(dt)
        hidden_states[-1] = h
        return {"last_hidden_state": h, "hidden_states": hidden_states}


def fuse_qkv_params_whisper(params):
    """Rewrite split q/k/v into the fused layout (see ``fused_qkv``).

    Exact relayout: kernels concat to [D, 3D]; the fused bias is
    [q_bias | zeros | v_bias] (whisper's k_proj carries no bias term).
    """
    out = {}
    for name, sub in params.items():
        if name.startswith("layer") and "self_attn" in sub:
            attn = dict(sub["self_attn"])
            if all(p in attn for p in ("q_proj", "k_proj", "v_proj")):
                q, k, v = (attn.pop(p) for p in ("q_proj", "k_proj", "v_proj"))
                attn["qkv_proj"] = {
                    "kernel": jnp.concatenate(
                        [q["kernel"], k["kernel"], v["kernel"]], axis=1
                    ),
                    "bias": jnp.concatenate(
                        [q["bias"], jnp.zeros_like(q["bias"]), v["bias"]]
                    ),
                }
            sub = {**sub, "self_attn": attn}
        out[name] = sub
    return out
