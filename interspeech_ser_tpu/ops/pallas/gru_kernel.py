"""Fused GRU sequence kernel (Pallas TPU).

The bidirectional GRU is the fusion classifier's hot serial op
(SURVEY.md §7 hard part 4): ``lax.scan`` emits one small matmul + gate
chain per timestep with the hidden kernel re-fetched from HBM every step.
This kernel runs the WHOLE direction in one ``pallas_call``: the grid
iterates timesteps sequentially (TPU grids are sequential), the recurrent
weights live in VMEM for the entire sequence, the carry persists in VMEM
scratch, and the per-step input projections stream in as blocks.

Same torch gate math as ops/gru.gru_scan (r, z, n order; hidden bias
inside the reset product); masked carry-freeze semantics included.
Forward-only (extraction / frozen-GRU paths); training falls back to the
scan (autodiff through pallas sequential grids is future work).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, m_ref, whh_ref, bhh_ref, out_ref, h_scr, *, hidden: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)

    h = h_scr[:]  # [B, H] f32
    hp = jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32) + bhh_ref[0]
    xp = x_ref[0]  # [B, 3H] (input projection, precomputed)
    H = hidden
    r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
    z = jax.nn.sigmoid(xp[:, H : 2 * H] + hp[:, H : 2 * H])
    n = jnp.tanh(xp[:, 2 * H :] + r * hp[:, 2 * H :])
    h_new = (1.0 - z) * n + z * h
    m = m_ref[0]  # [B, 1]
    h_next = m * h_new + (1.0 - m) * h
    h_scr[:] = h_next
    out_ref[0] = (h_next * m).astype(out_ref.dtype)


def gru_sequence(
    x_proj: jnp.ndarray,  # [B, T, 3H] input contributions (x @ W_ih + b_ih), f32
    w_hh: jnp.ndarray,  # [H, 3H]
    b_hh: jnp.ndarray,  # [3H]
    mask: Optional[jnp.ndarray] = None,  # [B, T]
    reverse: bool = False,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """→ [B, T, H] hidden states (zeros at masked steps)."""
    B, T, H3 = x_proj.shape
    H = H3 // 3
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if mask is None:
        mask = jnp.ones((B, T), jnp.float32)
    xs = jnp.swapaxes(x_proj.astype(jnp.float32), 0, 1)  # [T, B, 3H]
    ms = jnp.swapaxes(mask.astype(jnp.float32), 0, 1)[:, :, None]  # [T, B, 1]
    if reverse:
        xs = xs[::-1]
        ms = ms[::-1]

    out = pl.pallas_call(
        lambda x_ref, m_ref, whh_ref, bhh_ref, out_ref, h_scr: _kernel(
            x_ref, m_ref, whh_ref, bhh_ref, out_ref, h_scr, hidden=H
        ),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H3), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, B, 1), lambda t: (t, 0, 0)),
            pl.BlockSpec((H, H3), lambda t: (0, 0)),
            pl.BlockSpec((1, H3), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B, H), x_proj.dtype),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(xs, ms, w_hh.astype(jnp.float32), b_hh.astype(jnp.float32)[None, :])

    if reverse:
        out = out[::-1]
    return jnp.swapaxes(out, 0, 1)  # [B, T, H]


def _kernel_bidir(x_ref, m_ref, whh_ref, bhh_ref, out_ref, h_scr, *, hidden: int, half: int):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)

    H = hidden
    h = h_scr[:]  # [2B, H]
    # per-half recurrent weights: rows [:B] forward, [B:] backward
    hp_f = jnp.dot(h[:half], whh_ref[0], preferred_element_type=jnp.float32)
    hp_b = jnp.dot(h[half:], whh_ref[1], preferred_element_type=jnp.float32)
    hp = jnp.concatenate(
        [hp_f + bhh_ref[0, 0], hp_b + bhh_ref[1, 0]], axis=0
    )  # [2B, 3H]
    xp = x_ref[0]
    r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
    z = jax.nn.sigmoid(xp[:, H : 2 * H] + hp[:, H : 2 * H])
    n = jnp.tanh(xp[:, 2 * H :] + r * hp[:, 2 * H :])
    h_new = (1.0 - z) * n + z * h
    m = m_ref[0]
    h_next = m * h_new + (1.0 - m) * h
    h_scr[:] = h_next
    out_ref[0] = (h_next * m).astype(out_ref.dtype)


def gru_sequence_bidir(
    x_proj: jnp.ndarray,  # [2B, T, 3H]: rows [:B] fwd, [B:] time-reversed bwd
    w_hh2: jnp.ndarray,  # [2, H, 3H]
    b_hh2: jnp.ndarray,  # [2, 3H]
    mask: jnp.ndarray,  # [2B, T]
    half: int,  # B
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Both GRU directions in ONE sequential-grid kernel → [2B, T, H].

    The recurrence is latency-bound; stacking the directions doubles the
    per-step MXU work at the same step latency.
    """
    B2, T, H3 = x_proj.shape
    H = H3 // 3
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    xs = jnp.swapaxes(x_proj.astype(jnp.float32), 0, 1)  # [T, 2B, 3H]
    ms = jnp.swapaxes(mask.astype(jnp.float32), 0, 1)[:, :, None]

    out = pl.pallas_call(
        lambda x_ref, m_ref, whh_ref, bhh_ref, out_ref, h_scr: _kernel_bidir(
            x_ref, m_ref, whh_ref, bhh_ref, out_ref, h_scr, hidden=H, half=half
        ),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B2, H3), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, B2, 1), lambda t: (t, 0, 0)),
            pl.BlockSpec((2, H, H3), lambda t: (0, 0, 0)),
            pl.BlockSpec((2, 1, H3), lambda t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, B2, H), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T, B2, H), x_proj.dtype),
        scratch_shapes=[pltpu.VMEM((B2, H), jnp.float32)],
        interpret=interpret,
    )(xs, ms, w_hh2.astype(jnp.float32), b_hh2.astype(jnp.float32)[:, None, :])

    return jnp.swapaxes(out, 0, 1)
