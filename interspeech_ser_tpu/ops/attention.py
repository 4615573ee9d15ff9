"""Masked multi-head attention + attention pooling (torch-parity layouts).

``TorchMultiheadAttention`` reproduces torch ``nn.MultiheadAttention``
(batch_first): packed q/k/v projection (``in_proj_weight``), scaling by
``(E / num_heads) ** -0.5``, softmax over keys, dropout on attention
weights, output projection. Used by the fusion classifiers'
cross-modal attention (reference: bin/train_cat_bimodal_lazy_1head.py:269-270)
with 1 head (2 heads for trimodal prosody,
train_cat_trimodal_lazy_1head.py:292).

``attention_pool`` is the reference's softmax pooling over time
(train_cat_bimodal_lazy_1head.py:286-297) extended with a key mask so padded
frames receive zero weight — a padded batched run then matches the
reference's batch-1 unpadded eval exactly.

Sequence lengths here are ≤ ~600 and the embed dim is 1024 with 1-2 heads;
a full [T_q, T_k] attention matrix fits comfortably in VMEM after XLA
fusion, so this op intentionally uses plain XLA einsums (the flash-attention
Pallas kernel in ``ops/pallas`` is for the 24-48-layer encoder zoo, where
the score tensor is the HBM-bandwidth bottleneck).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e30


class TorchMultiheadAttention(nn.Module):
    """torch ``nn.MultiheadAttention`` (batch_first=True) in flax.

    Params: ``in_proj_kernel`` [E, 3E] (transposed torch ``in_proj_weight``),
    ``in_proj_bias`` [3E], ``out_kernel`` [E, E] (transposed
    ``out_proj.weight``), ``out_bias`` [E].
    """

    embed_dim: int
    num_heads: int = 1
    dropout: float = 0.0
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Tq, E]
        key: jnp.ndarray,  # [B, Tk, E]
        value: jnp.ndarray,  # [B, Tk, E]
        key_mask: Optional[jnp.ndarray] = None,  # [B, Tk], 1 = attend
        deterministic: bool = True,
    ) -> jnp.ndarray:
        E, H = self.embed_dim, self.num_heads
        assert E % H == 0
        head_dim = E // H

        # torch xavier_uniform_ over the packed [3E, E] matrix.
        def xavier_packed(rng, shape, dtype=self.param_dtype):
            fan_in, fan_out = E, 3 * E
            a = (6.0 / (fan_in + fan_out)) ** 0.5
            return jax.random.uniform(rng, shape, dtype, -a, a)

        in_proj_kernel = self.param("in_proj_kernel", xavier_packed, (E, 3 * E))
        in_proj_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,), self.param_dtype)
        out_kernel = self.param(
            "out_kernel", nn.initializers.xavier_uniform(), (E, E), self.param_dtype
        )
        out_bias = self.param("out_bias", nn.initializers.zeros, (E,), self.param_dtype)

        dtype = query.dtype
        wq, wk, wv = jnp.split(in_proj_kernel.astype(dtype), 3, axis=1)
        bq, bk, bv = jnp.split(in_proj_bias.astype(dtype), 3)

        q = query @ wq + bq  # [B, Tq, E]
        k = key @ wk + bk  # [B, Tk, E]
        v = value @ wv + bv

        B, Tq, _ = q.shape
        Tk = k.shape[1]
        q = q.reshape(B, Tq, H, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, Tk, H, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, Tk, H, head_dim).transpose(0, 2, 1, 3)

        scale = head_dim ** -0.5
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
        )
        if key_mask is not None:
            scores = jnp.where(key_mask[:, None, None, :].astype(bool), scores, NEG_INF)
        weights = jax.nn.softmax(scores, axis=-1)
        if self.dropout > 0.0 and not deterministic:
            weights = nn.Dropout(rate=self.dropout)(weights, deterministic=False)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", weights.astype(dtype), v, preferred_element_type=jnp.float32
        ).astype(dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, E)
        return out @ out_kernel.astype(dtype) + out_bias.astype(dtype)


def attention_pool(
    features: jnp.ndarray,  # [B, T, D]
    scores: jnp.ndarray,  # [B, T, 1] raw scores from a Linear(D, 1)
    mask: Optional[jnp.ndarray] = None,  # [B, T], 1 = valid
) -> jnp.ndarray:
    """Softmax-over-time weighted sum (reference attention_pool, L286-297)."""
    s = scores.astype(jnp.float32)
    if mask is not None:
        s = jnp.where(mask[:, :, None].astype(bool), s, NEG_INF)
    w = jax.nn.softmax(s, axis=1)
    return jnp.sum(features.astype(jnp.float32) * w, axis=1).astype(features.dtype)
