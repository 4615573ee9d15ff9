"""Flash attention (Pallas TPU): streaming-softmax attention without
materializing the [Tq, Tk] score tensor in HBM.

Entry point used by ops.attention_core for long sequences (Whisper's 1500
mel frames, XLS-R-2B). Falls back to the fused XLA path when shapes don't
meet tiling constraints or when running on CPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def flash_attention(
    q: jnp.ndarray,  # [B, H, Tq, Dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Currently delegates to the fused XLA path; Pallas kernel lands next.

    Kept as the single dispatch point so the kernel swap is invisible to
    the encoder zoo.
    """
    from ..attention_core import dot_product_attention

    return dot_product_attention(q, k, v, key_mask=key_mask, scale=scale, force_impl="xla")
