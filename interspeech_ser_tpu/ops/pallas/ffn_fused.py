"""Fused FFN pair: x·W_up → bias+GELU → ·W_down in ONE kernel.

The encoder MLP pair ([M,1024]×[1024,4096] → gelu → ×[4096,1024]) runs at
154 TF/s under XLA (scripts/exp_gemm_roofline.py) vs the 178 TF/s the chip
reaches on giant squares. XLA compiles the pair as two GEMMs with the
[M,4096] intermediate materialized in HBM between them (~157 MB each way
at the WavLM extraction shape). This kernel keeps the intermediate
VMEM-resident per row-tile: both weight panels are fetched once (constant
index maps → the pipeline re-uses the resident block across grid steps),
the grid walks M in ``block_m`` tiles, and each tile computes
``gelu(x·W_up + b_up)·W_down + b_down`` without the intermediate ever
touching HBM.

Measured verdict (scripts/exp_ffn_fused.py, real v5e): see STATUS — this
closes VERDICT r04's last untried MXU angle either way.

Inference-only (no custom_vjp): reaches the model via the
``SER_TPU_FFN_KERNEL=1`` env opt-in on the FeedForward module, gated like
the other no-vjp kernels on ``cfg.inference_kernels``.

Reference hot loop: preprocessing/preprocess_speech.py:53 (the 24-layer
encoder forward whose FFN pairs carry ~45% of stack FLOPs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wu_ref, bu_ref, wd_ref, bd_ref, o_ref, *, approx_gelu):
    # [bm, K] · [K, F] → f32 [bm, F]; bias+gelu on the VPU while the tile
    # is register/VMEM resident; second dot back to [bm, N]
    h = jnp.dot(x_ref[:], wu_ref[:], preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + bu_ref[:].astype(jnp.float32), approximate=approx_gelu)
    out = jnp.dot(
        h.astype(wd_ref.dtype), wd_ref[:], preferred_element_type=jnp.float32
    )
    o_ref[:] = (out + bd_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def ffn_fused(
    x: jnp.ndarray,  # [M, K]
    w_up: jnp.ndarray,  # [K, F]
    b_up: jnp.ndarray,  # [F]
    w_down: jnp.ndarray,  # [F, N]
    b_down: jnp.ndarray,  # [N]
    *,
    block_m: int = 512,
    approx_gelu: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """gelu(x @ w_up + b_up) @ w_down + b_down, intermediate VMEM-only.

    M is padded up to ``block_m`` (zero rows compute garbage rows that are
    sliced off — gelu(b_up)·W_down is finite, so no NaN hazard).
    """
    M, K = x.shape
    F = w_up.shape[1]
    N = w_down.shape[1]
    bm = min(block_m, max(8, M))
    Mp = ((M + bm - 1) // bm) * bm
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, approx_gelu=approx_gelu),
        grid=(Mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i: (i, 0)),
            pl.BlockSpec((K, F), lambda i: (0, 0)),  # resident across steps
            pl.BlockSpec((1, F), lambda i: (0, 0)),
            pl.BlockSpec((F, N), lambda i: (0, 0)),  # resident across steps
            pl.BlockSpec((1, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            # both weight panels resident (16 MB bf16) + f32 intermediate
            # tile + double-buffered x/out tiles — over the 16 MiB default
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w_up, b_up[None, :], w_down, b_down[None, :])
    return out[:M] if Mp != M else out
