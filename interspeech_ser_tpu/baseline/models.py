"""Challenge-baseline model heads: attentive statistics pooling + MLP head.

TPU-native ports of reference benchmark/net/pooling.py and net/ser.py with
torch-checkpoint converters so ``final_{ser,pool}.pt`` files interoperate
both ways.

``AttentiveStatisticsPooling`` is vectorized + masked (one fused batch op)
instead of the reference's per-sample python loop (pooling.py:48-59),
with identical math: softmax attention over tanh-projected frames, output
concat(μ, σ), frame count from the sample-level mask via the reference's
20 ms-hop formula ``(wav_len - 1)//320 + 1`` (pooling.py:14-22).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NEG_INF = -1e30


def frame_lengths_from_mask(mask: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """Sample-level mask [B, L] → frame counts, clipped to num_frames."""
    wav_lens = jnp.sum(mask, axis=1)
    feat_lens = jnp.floor((wav_lens - 1) / (16000 * 0.02)) + 1
    return jnp.clip(feat_lens.astype(jnp.int32), 0, num_frames)


class AttentiveStatisticsPooling(nn.Module):
    """[B, T, D] + wav mask [B, L] → [B, 2D] (μ ‖ σ)."""

    input_size: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B, T, D = xs.shape
        feat_lens = frame_lengths_from_mask(mask, T)
        frame_mask = jnp.arange(T)[None, :] < feat_lens[:, None]  # [B, T]

        h = jnp.tanh(
            nn.Dense(self.input_size, param_dtype=self.param_dtype, name="sap_linear")(xs)
        )
        attention = self.param(
            "attention", nn.initializers.normal(1.0), (self.input_size, 1),
            self.param_dtype,
        )
        w = (h.astype(jnp.float32) @ attention.astype(jnp.float32))[..., 0]  # [B, T]
        w = jnp.where(frame_mask, w, NEG_INF)
        w = jax.nn.softmax(w, axis=1)[:, :, None]  # [B, T, 1]

        x32 = xs.astype(jnp.float32)
        mu = jnp.sum(x32 * w, axis=1)
        var = jnp.sum((x32 ** 2) * w, axis=1) - mu ** 2
        rh = jnp.sqrt(jnp.clip(var, min=1e-5))
        return jnp.concatenate([mu, rh], axis=1).astype(xs.dtype)


class EmotionRegression(nn.Module):
    """MLP head: [Linear→LayerNorm→ReLU→Dropout]×num_layers → Linear.

    Reference net/ser.py:5-39 (used with num_layers=1, hidden 1024,
    output 8 categorical / 3 dimensional).
    """

    input_dim: int
    hidden_dim: int
    num_layers: int
    output_dim: int
    dropout: float = 0.5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dropout(rate=self.dropout)(x, deterministic=deterministic)
        for i in range(self.num_layers):
            h = nn.Dense(self.hidden_dim, param_dtype=self.param_dtype, name=f"fc{i}")(h)
            h = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype, name=f"ln{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(rate=self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.output_dim, param_dtype=self.param_dtype, name="out")(h)


# -- torch checkpoint converters (final_ser.pt / final_pool.pt) -------------


def pooling_torch_to_flax(sd: Dict[str, np.ndarray]) -> Dict:
    return {
        "sap_linear": {
            "kernel": np.asarray(sd["sap_linear.weight"]).T,
            "bias": np.asarray(sd["sap_linear.bias"]),
        },
        "attention": np.asarray(sd["attention"]),
    }


def pooling_flax_to_torch(params: Dict) -> Dict[str, np.ndarray]:
    return {
        "sap_linear.weight": np.asarray(params["sap_linear"]["kernel"]).T,
        "sap_linear.bias": np.asarray(params["sap_linear"]["bias"]),
        "attention": np.asarray(params["attention"]),
    }


def ser_torch_to_flax(sd: Dict[str, np.ndarray], num_layers: int) -> Dict:
    p: Dict = {}
    for i in range(num_layers):
        p[f"fc{i}"] = {
            "kernel": np.asarray(sd[f"fc.{i}.0.weight"]).T,
            "bias": np.asarray(sd[f"fc.{i}.0.bias"]),
        }
        p[f"ln{i}"] = {
            "scale": np.asarray(sd[f"fc.{i}.1.weight"]),
            "bias": np.asarray(sd[f"fc.{i}.1.bias"]),
        }
    p["out"] = {
        "kernel": np.asarray(sd["out.0.weight"]).T,
        "bias": np.asarray(sd["out.0.bias"]),
    }
    return p


def ser_flax_to_torch(params: Dict, num_layers: int) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    for i in range(num_layers):
        sd[f"fc.{i}.0.weight"] = np.asarray(params[f"fc{i}"]["kernel"]).T
        sd[f"fc.{i}.0.bias"] = np.asarray(params[f"fc{i}"]["bias"])
        sd[f"fc.{i}.1.weight"] = np.asarray(params[f"ln{i}"]["scale"])
        sd[f"fc.{i}.1.bias"] = np.asarray(params[f"ln{i}"]["bias"])
    sd["out.0.weight"] = np.asarray(params["out"]["kernel"]).T
    sd["out.0.bias"] = np.asarray(params["out"]["bias"])
    return sd
