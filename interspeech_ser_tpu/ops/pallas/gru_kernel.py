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
The bidirectional variant is DIFFERENTIABLE: ``gru_bidir_carries``
carries a custom_vjp whose backward is a hand-derived reverse
``lax.scan`` recomputing gates from the emitted carry sequence, so the
kernel serves the training path too (single-direction ``gru_sequence``
stays forward-only).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The backward kernel keeps the recurrent weights AND the dW accumulators
# VMEM-resident (f32 [2, H, 3H] each = 6.3 MB at H=512), which together
# with the double-buffered per-step blocks overflows the compiler's
# default 16 MiB scoped-vmem limit (measured 16.51 MiB at the production
# text-GRU shape B2=128 H=512 — exp_gru_train r03b). With K=8 grid
# unrolling the double-buffered time blocks are 8× fatter (~47 MiB total
# at the production shape). v5e has 128 MiB physical; raise the scoped
# limit like the attention kernels do.
_VMEM_LIMIT = 64 * 2 ** 20
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _grid_unroll(T: int) -> int:
    """Recurrent steps per grid iteration for the bidirectional kernels.

    Batching K steps into one grid iteration amortizes the fixed
    grid-sequencing/DMA-descriptor cost. MEASURED (v5e, production shape
    B2=128 H=512 T=512, scripts/exp_fusion_anatomy.py): isolated fwd+bwd
    pair 7.25 ms at K=8 vs 7.47 at K=1 (~3%); full fusion train step
    26.1 → 25.9 ms. Small because the serial dependency chain — not the
    per-iteration overhead — is the bound; kept because the win is
    consistent in both kernels and the math is identical in the same
    order (exact). Overridable via SER_TPU_GRU_UNROLL; clamped to T.
    """
    env = os.environ.get("SER_TPU_GRU_UNROLL")
    K = int(env) if env else 8
    return max(1, min(K, T))


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
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(xs, ms, w_hh.astype(jnp.float32), b_hh.astype(jnp.float32)[None, :])

    if reverse:
        out = out[::-1]
    return jnp.swapaxes(out, 0, 1)  # [B, T, H]


def _kernel_bidir(
    x_ref, m_ref, whh_ref, bhh_ref, out_ref, h_scr, *,
    hidden: int, half: int, unroll: int = 1,
):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)

    H = hidden
    # ``unroll`` recurrent steps per grid iteration (statically unrolled):
    # identical per-step math, but the per-iteration fixed cost (grid
    # sequencing + DMA descriptor setup) is amortized K-fold — the
    # recurrence is latency- not FLOP-bound (~7 µs/step measured vs
    # ~1-2 µs of per-step work, scripts/exp_fusion_anatomy.py).
    for k in range(unroll):
        h = h_scr[:]  # [2B, H]
        # per-half recurrent weights: rows [:B] forward, [B:] backward
        hp_f = jnp.dot(h[:half], whh_ref[0], preferred_element_type=jnp.float32)
        hp_b = jnp.dot(h[half:], whh_ref[1], preferred_element_type=jnp.float32)
        hp = jnp.concatenate(
            [hp_f + bhh_ref[0, 0], hp_b + bhh_ref[1, 0]], axis=0
        )  # [2B, 3H]
        xp = x_ref[k]
        r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
        z = jax.nn.sigmoid(xp[:, H : 2 * H] + hp[:, H : 2 * H])
        n = jnp.tanh(xp[:, 2 * H :] + r * hp[:, 2 * H :])
        h_new = (1.0 - z) * n + z * h
        m = m_ref[k]
        h_next = m * h_new + (1.0 - m) * h
        h_scr[:] = h_next
        # UNMASKED carry emitted (masked steps hold the frozen carry); the
        # wrapper multiplies by the mask outside — keeping the multiply out
        # of the custom_vjp means the backward receives d(carry) with the
        # mask factor already applied by autodiff, and the carry sequence
        # doubles as the training residual (no second output needed)
        out_ref[k] = h_next.astype(out_ref.dtype)


def _bidir_carries_impl(
    x_proj: jnp.ndarray,  # [2B, T, 3H]
    w_hh2: jnp.ndarray,  # [2, H, 3H]
    b_hh2: jnp.ndarray,  # [2, 3H]
    mask: jnp.ndarray,  # [2B, T]
    interpret: Optional[bool],
) -> jnp.ndarray:  # [2B, T, H] unmasked carries
    B2, T, H3 = x_proj.shape
    H = H3 // 3
    half = B2 // 2
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    K = _grid_unroll(T)
    xs = jnp.swapaxes(x_proj.astype(jnp.float32), 0, 1)  # [T, 2B, 3H]
    ms = jnp.swapaxes(mask.astype(jnp.float32), 0, 1)[:, :, None]
    # pad time to a multiple of K with mask 0 (carry freeze → padded
    # steps emit the frozen final carry, sliced off below; exact)
    T_p = ((T + K - 1) // K) * K
    if T_p != T:
        xs = jnp.pad(xs, ((0, T_p - T), (0, 0), (0, 0)))
        ms = jnp.pad(ms, ((0, T_p - T), (0, 0), (0, 0)))

    out = pl.pallas_call(
        lambda x_ref, m_ref, whh_ref, bhh_ref, out_ref, h_scr: _kernel_bidir(
            x_ref, m_ref, whh_ref, bhh_ref, out_ref, h_scr,
            hidden=H, half=half, unroll=K,
        ),
        grid=(T_p // K,),
        in_specs=[
            pl.BlockSpec((K, B2, H3), lambda t: (t, 0, 0)),
            pl.BlockSpec((K, B2, 1), lambda t: (t, 0, 0)),
            pl.BlockSpec((2, H, H3), lambda t: (0, 0, 0)),
            pl.BlockSpec((2, 1, H3), lambda t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((K, B2, H), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((T_p, B2, H), x_proj.dtype),
        scratch_shapes=[pltpu.VMEM((B2, H), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(xs, ms, w_hh2.astype(jnp.float32), b_hh2.astype(jnp.float32)[:, None, :])

    return jnp.swapaxes(out[:T], 0, 1)


def _kernel_bidir_bwd(
    g_ref,  # [K, 2B, H] upstream cotangent at the block's (reversed) steps
    hprev_ref,  # [K, 2B, H] carry entering each step
    x_ref,  # [K, 2B, 3H] input projection at each step
    m_ref,  # [K, 2B, 1] mask
    whh_ref,  # [2, H, 3H]
    bhh_ref,  # [2, 1, 3H]
    dxp_ref,  # out: [K, 2B, 3H]
    dwhh_ref,  # out: [2, H, 3H] (block resident across the grid)
    dbhh_ref,  # out: [2, 1, 3H]
    dh_scr,  # scratch: [2B, H] f32 running carry-cotangent
    *,
    hidden: int,
    half: int,
    unroll: int = 1,
):
    """Reverse-time GRU backward as ONE sequential-grid kernel.

    Mirrors the scan in the custom_vjp docstring below, but with the
    recurrent weights AND the dW/db accumulators VMEM-resident for the
    whole sequence (the accumulators live in the constant-index output
    blocks, so they never ride HBM between steps) — the same structure
    that made the forward kernel win over ``lax.scan``. ``unroll`` steps
    per grid iteration, walked in descending k (time runs backwards).
    """
    t = pl.program_id(0)
    H = hidden

    @pl.when(t == 0)
    def _init():
        dh_scr[:] = jnp.zeros(dh_scr.shape, dh_scr.dtype)
        dwhh_ref[...] = jnp.zeros(dwhh_ref.shape, dwhh_ref.dtype)
        dbhh_ref[...] = jnp.zeros(dbhh_ref.shape, dbhh_ref.dtype)

    for k in range(unroll - 1, -1, -1):
        hprev = hprev_ref[k]  # [2B, H] f32
        xp = x_ref[k]
        m = m_ref[k]
        # recompute the gates from the saved carries
        hp_f = jnp.dot(
            hprev[:half], whh_ref[0], preferred_element_type=jnp.float32
        )
        hp_b = jnp.dot(
            hprev[half:], whh_ref[1], preferred_element_type=jnp.float32
        )
        hp = jnp.concatenate(
            [hp_f + bhh_ref[0, 0], hp_b + bhh_ref[1, 0]], axis=0
        )
        r = jax.nn.sigmoid(xp[:, :H] + hp[:, :H])
        z = jax.nn.sigmoid(xp[:, H : 2 * H] + hp[:, H : 2 * H])
        hn = hp[:, 2 * H :]
        n = jnp.tanh(xp[:, 2 * H :] + r * hn)

        dht = g_ref[k].astype(jnp.float32) + dh_scr[:]
        dh_new = dht * m
        dh_skip = dht * (1.0 - m)
        dn_pre = dh_new * (1.0 - z) * (1.0 - n * n)
        dz_pre = dh_new * (hprev - n) * z * (1.0 - z)
        dr_pre = dn_pre * hn * r * (1.0 - r)
        dxp = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)  # [2B, 3H]
        dhp = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=-1)
        # dh through the recurrent matmul: dhp @ whh^T per direction
        back_f = jax.lax.dot_general(
            dhp[:half], whh_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        back_b = jax.lax.dot_general(
            dhp[half:], whh_ref[1], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dh_scr[:] = (
            dh_skip + dh_new * z + jnp.concatenate([back_f, back_b], axis=0)
        )
        # weight/bias cotangents accumulate in the resident output blocks
        dwhh_ref[0] += jax.lax.dot_general(
            hprev[:half], dhp[:half], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dwhh_ref[1] += jax.lax.dot_general(
            hprev[half:], dhp[half:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbhh_ref[0, 0] += jnp.sum(dhp[:half], axis=0)
        dbhh_ref[1, 0] += jnp.sum(dhp[half:], axis=0)
        dxp_ref[k] = dxp.astype(dxp_ref.dtype)


def _bidir_bwd_kernel_impl(x_proj, w_hh2, b_hh2, mask, h, g, interpret):
    """Pallas reverse-grid dispatch of the backward above → (dxp, dwhh, dbhh)."""
    B2, T, H3 = x_proj.shape
    H = H3 // 3
    half = B2 // 2
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    f32 = jnp.float32
    K = _grid_unroll(T)
    xs = jnp.swapaxes(x_proj.astype(f32), 0, 1)  # [T, 2B, 3H]
    gs = jnp.swapaxes(g.astype(f32), 0, 1)  # [T, 2B, H]
    hs = jnp.swapaxes(h.astype(f32), 0, 1)  # [T, 2B, H]
    h_prev = jnp.concatenate([jnp.zeros_like(hs[:1]), hs[:-1]], axis=0)
    ms = jnp.swapaxes(mask.astype(f32), 0, 1)[:, :, None]
    # pad time to a multiple of K with mask 0 AND g 0: a padded step has
    # every gate cotangent scaled by m=0 (dxp=0, dW+=0) and passes dh
    # through dh_skip unchanged — an exact no-op
    T_p = ((T + K - 1) // K) * K
    if T_p != T:
        pad = ((0, T_p - T), (0, 0), (0, 0))
        xs, gs, h_prev, ms = (jnp.pad(a, pad) for a in (xs, gs, h_prev, ms))

    rev = lambda t: (T_p // K - 1 - t, 0, 0)  # grid walks time backwards
    dxp, dwhh, dbhh = pl.pallas_call(
        lambda g_r, hp_r, x_r, m_r, w_r, b_r, dx_r, dw_r, db_r, dh_s: (
            _kernel_bidir_bwd(
                g_r, hp_r, x_r, m_r, w_r, b_r, dx_r, dw_r, db_r, dh_s,
                hidden=H, half=half, unroll=K,
            )
        ),
        grid=(T_p // K,),
        in_specs=[
            pl.BlockSpec((K, B2, H), rev),
            pl.BlockSpec((K, B2, H), rev),
            pl.BlockSpec((K, B2, H3), rev),
            pl.BlockSpec((K, B2, 1), rev),
            pl.BlockSpec((2, H, H3), lambda t: (0, 0, 0)),
            pl.BlockSpec((2, 1, H3), lambda t: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((K, B2, H3), rev),
            pl.BlockSpec((2, H, H3), lambda t: (0, 0, 0)),
            pl.BlockSpec((2, 1, H3), lambda t: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_p, B2, H3), f32),
            jax.ShapeDtypeStruct((2, H, H3), f32),
            jax.ShapeDtypeStruct((2, 1, H3), f32),
        ],
        scratch_shapes=[pltpu.VMEM((B2, H), f32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(
        gs, h_prev, xs, ms,
        w_hh2.astype(f32), b_hh2.astype(f32)[:, None, :],
    )
    return jnp.swapaxes(dxp[:T], 0, 1), dwhh, dbhh[:, 0, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gru_bidir_carries(x_proj, w_hh2, b_hh2, mask, interpret=None):
    """Differentiable fused bidirectional GRU → UNMASKED carries [2B, T, H].

    Forward runs the sequential-grid Pallas kernel (recurrent weights
    VMEM-resident, both directions batch-stacked); backward is a
    hand-derived reverse ``lax.scan`` that recomputes the gates from the
    saved carry sequence (no storage beyond the carries the kernel
    already emits). This makes the kernel usable on the TRAINING path —
    the scan-fwd + autodiff-bwd recurrence was the fusion train step's
    latency bound (29.7 ms/step at bs64 before this).
    """
    return _bidir_carries_impl(x_proj, w_hh2, b_hh2, mask, interpret)


def _gru_bidir_fwd(x_proj, w_hh2, b_hh2, mask, interpret):
    h = _bidir_carries_impl(x_proj, w_hh2, b_hh2, mask, interpret)
    return h, (x_proj, w_hh2, b_hh2, mask, h)


def _gru_bidir_bwd(interpret, res, g):
    """custom_vjp backward: the Pallas reverse-grid kernel above.

    Math notes (forward gate math in ops/gru.py — torch r,z,n order,
    n-gate hidden bias inside the reset product):
      h_t = m·h_new + (1-m)·h_{t-1},  h_new = (1-z)·n + z·h_{t-1}
    so d h_new = d h_t · m and the (1-m) skip passes gradient straight
    through the frozen carry at masked steps — which is exactly what
    makes batched-padded grads equal per-utterance unpadded grads.

    MEASURED history (v5e, production fusion train step bs64,
    whisper1280-T512 + roberta1024-T80, scripts/exp_gru_train.py):
    scan fwd + autodiff bwd 29.72 ms/step; kernel fwd + hand-scan bwd
    31.0 (0.97x); a whole-sequence-MXU hoist 40.1 (HBM round-trips of
    [T,2,B,3H] f32 coefficients); kernel fwd + THIS Pallas backward
    25.99 ms/step (1.143x — the win, once the scoped-vmem limit above
    let it compile). The backward keeps the weights AND dW/db
    accumulators VMEM-resident across the whole reverse grid — the
    structure that made the forward kernel win. engine._use_gru_kernel
    decides where the kernel pair actually runs (training default on
    single-device TPU; eval everywhere the call is local compute).
    """
    x_proj, w_hh2, b_hh2, mask, h = res
    dxp, dwhh, dbhh = _bidir_bwd_kernel_impl(
        x_proj, w_hh2, b_hh2, mask, h, g, interpret
    )
    return (
        dxp.astype(x_proj.dtype),
        dwhh.astype(w_hh2.dtype),
        dbhh.astype(b_hh2.dtype),
        jnp.zeros_like(mask),
    )


def _gru_bidir_bwd_scan(interpret, res, g):
    """Reference backward: hand-derived reverse ``lax.scan`` (same math).
    Kept for gradient-parity tests and the exp_gru_train A/B."""
    del interpret
    x_proj, w_hh2, b_hh2, mask, h = res
    B2, T, H3 = x_proj.shape
    H = H3 // 3
    B = B2 // 2
    f32 = jnp.float32

    def tm(a, width):  # [2B, T, w] → time-major direction-split [T, 2, B, w]
        return jnp.swapaxes(a, 0, 1).reshape(T, 2, B, width)

    xs = tm(x_proj.astype(f32), H3)
    gs = tm(g.astype(f32), H)
    hs = tm(h.astype(f32), H)
    ms = tm(mask.astype(f32)[:, :, None], 1)
    h_prev = jnp.concatenate([jnp.zeros_like(hs[:1]), hs[:-1]], axis=0)
    whh = w_hh2.astype(f32)  # [2, H, 3H]
    bhh = b_hh2.astype(f32)  # [2, 3H]

    def step(carry, inp):
        dh, dwhh, dbhh = carry
        g_t, hprev, xp_t, m_t = inp  # [2,B,H] [2,B,H] [2,B,3H] [2,B,1]
        hp = jnp.einsum("dbh,dhk->dbk", hprev, whh) + bhh[:, None, :]
        r = jax.nn.sigmoid(xp_t[..., :H] + hp[..., :H])
        z = jax.nn.sigmoid(xp_t[..., H : 2 * H] + hp[..., H : 2 * H])
        hn = hp[..., 2 * H :]
        n = jnp.tanh(xp_t[..., 2 * H :] + r * hn)
        dht = g_t + dh
        dh_new = dht * m_t
        dh_skip = dht * (1.0 - m_t)
        dn_pre = dh_new * (1.0 - z) * (1.0 - n * n)
        dz_pre = dh_new * (hprev - n) * z * (1.0 - z)
        dr_pre = dn_pre * hn * r * (1.0 - r)
        dxp = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
        dhp = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=-1)
        dh_out = dh_skip + dh_new * z + jnp.einsum("dbk,dhk->dbh", dhp, whh)
        dwhh = dwhh + jnp.einsum("dbh,dbk->dhk", hprev, dhp)
        dbhh = dbhh + jnp.sum(dhp, axis=1)
        return (dh_out, dwhh, dbhh), dxp

    init = (
        jnp.zeros((2, B, H), f32),
        jnp.zeros_like(whh),
        jnp.zeros_like(bhh),
    )
    (_, dwhh, dbhh), dxps = jax.lax.scan(
        step, init, (gs, h_prev, xs, ms), reverse=True, unroll=8
    )
    dxp = jnp.swapaxes(dxps.reshape(T, B2, H3), 0, 1).astype(x_proj.dtype)
    return (
        dxp,
        dwhh.astype(w_hh2.dtype),
        dbhh.astype(b_hh2.dtype),
        jnp.zeros_like(mask),
    )


gru_bidir_carries.defvjp(_gru_bidir_fwd, _gru_bidir_bwd)


def gru_sequence_bidir(
    x_proj: jnp.ndarray,  # [2B, T, 3H]: rows [:B] fwd, [B:] time-reversed bwd
    w_hh2: jnp.ndarray,  # [2, H, 3H]
    b_hh2: jnp.ndarray,  # [2, 3H]
    mask: jnp.ndarray,  # [2B, T]
    half: int,  # B — validated against x_proj (the kernel derives it)
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Both GRU directions in ONE sequential-grid kernel → [2B, T, H],
    zeros at masked steps. Differentiable (``gru_bidir_carries`` vjp).

    The recurrence is latency-bound; stacking the directions doubles the
    per-step MXU work at the same step latency.
    """
    if x_proj.shape[0] != 2 * half:
        raise ValueError(
            f"x_proj rows ({x_proj.shape[0]}) must be 2*half ({2 * half}): "
            "rows [:half] forward, [half:] time-reversed backward"
        )
    # the vjp returns zeros_like(mask) as its cotangent; a bool/int mask
    # would demand a float0 cotangent and crash jax.grad — the kernel only
    # scales/compares, so a float cast is exact
    if not jnp.issubdtype(mask.dtype, jnp.floating):
        mask = mask.astype(jnp.float32)
    h = gru_bidir_carries(x_proj, w_hh2, b_hh2, mask, interpret)
    return h * mask.astype(h.dtype)[:, :, None]
