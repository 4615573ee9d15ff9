"""Shared scaled-dot-product attention core for the encoder zoo.

Single swap point between the XLA einsum path (always correct, great for
short sequences after fusion) and the Pallas flash-attention kernel (long
sequences / big models, score tensor never hits HBM). Encoders call
:func:`dot_product_attention`; the kernel choice is automatic by size and
can be forced via ``force_impl``.

Softmax and score accumulation run in float32 regardless of compute dtype
(bf16-safe; SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30

_FLASH_MIN_SEQ = 1024  # below this the XLA path wins (fusion, no launch cost)


def dot_product_attention(
    q: jnp.ndarray,  # [B, H, Tq, Dh]
    k: jnp.ndarray,  # [B, H, Tk, Dh]
    v: jnp.ndarray,  # [B, H, Tk, Dh]
    bias: Optional[jnp.ndarray] = None,  # [B, H, Tq, Tk] or broadcastable
    key_mask: Optional[jnp.ndarray] = None,  # [B, Tk], 1 = attend
    scale: Optional[float] = None,
    force_impl: Optional[str] = None,  # 'xla' | 'flash'
) -> jnp.ndarray:
    """Masked SDPA with optional additive bias; f32 softmax."""
    if scale is None:
        scale = q.shape[-1] ** -0.5

    impl = force_impl
    if impl is None:
        impl = "flash" if q.shape[2] >= _FLASH_MIN_SEQ and bias is None else "xla"

    if impl == "flash":
        from .pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, key_mask=key_mask, scale=scale)

    dtype = q.dtype
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
    )
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, :].astype(bool), scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32).astype(
        dtype
    )
