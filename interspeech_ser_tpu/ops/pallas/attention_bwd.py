"""Differentiable one-shot [B,T,D] attention (custom_vjp backward kernel).

The oneshot2 forward kernel (flash_attention_short.attention_btd) is
inference-only — training engines fall back to the XLA path, which
materializes the [B,H,Tq,Tk] score/probability tensors in HBM twice
(forward + recompute in the backward) plus the gated relative-position
bias. This module gives the kernel a hand-derived backward in the SAME
one-shot [B,T,D] layout: one sequential pass over the batch grid, heads
as lane-column slices, P recomputed in VMEM from (q,k,v) residuals —
scores, probabilities and the gated bias never touch HBM in either
direction.

Backward math per (batch b, head h), with S = scale·q kᵀ + gate·bias +
madd and P = softmax(S):
    dV = Pᵀ g                  g = upstream cotangent of out
    dP = g Vᵀ
    dS = P ∘ (dP − rowsum(P ∘ dP))
    dQ = scale · dS K,   dK = scale · dSᵀ Q
    dgate[b,h] = rowsum(dS ∘ bias_h)
    dbias[h] += gate[b,h] ∘column dS        (accumulated over b)
Padded queries carry g = 0 → dS rows vanish; masked/padded keys carry
P = 0 → dS columns vanish; so padding contributes exactly zero to every
cotangent (tested).

Gating mirrors the GRU kernel's story: engines adopt it only behind a
measured A/B (scripts/exp_attn_bwd.py); the XLA autodiff path stays the
default until hardware confirms a win. Reference semantics: the fused
gate·bias factoring of models/speech.py SpeechSelfAttention.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention_short import (
    MAX_ONESHOT_TK,
    VmemBudgetError,
    _pad_axis,
    attention_btd,
)

_VMEM_LIMIT = 100 * 2 ** 20  # v5e: 128 MiB physical per core
_VMEM_BUDGET = 96 * 2 ** 20


def _bwd_kernel(
    q_ref,  # [1, Tq, D]
    k_ref,  # [1, Tk, D]
    v_ref,  # [1, Tk, D]
    g_ref,  # [1, Tq, D] upstream cotangent (zeros at padded queries)
    madd_ref,  # [1, 1, Tk] additive mask (0 attend / NEG_INF masked)
    gate_ref,  # [1, H, Tq] or absent
    bias_ref,  # [H, Tq, Tk] or absent (resident across the batch grid)
    dq_ref,  # [1, Tq, D]
    dk_ref,  # [1, Tk, D]
    dv_ref,  # [1, Tk, D]
    dgate_ref,  # [1, H, Tq] f32 or absent
    dbias_ref,  # [H, Tq, Tk] f32 or absent (accumulated over b)
    *,
    scale: float,
    num_heads: int,
    has_bias: bool,
):
    b = pl.program_id(0)
    D = q_ref.shape[-1]
    hd = D // num_heads
    madd = madd_ref[0, 0].astype(jnp.float32)  # [Tk]
    dt = q_ref.dtype
    sc = jnp.asarray(scale, jnp.float32)

    if has_bias:

        @pl.when(b == 0)
        def _init():
            dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)

    for h in range(num_heads):
        lo, hi = h * hd, (h + 1) * hd
        q = q_ref[0, :, lo:hi]  # [Tq, hd] dt
        k = k_ref[0, :, lo:hi]  # [Tk, hd]
        v = v_ref[0, :, lo:hi]
        g = g_ref[0, :, lo:hi]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sc  # [Tq, Tk] f32
        if has_bias:
            gate = gate_ref[0, h].astype(jnp.float32)  # [Tq]
            bias = bias_ref[h].astype(jnp.float32)  # [Tq, Tk]
            s = s + (gate[:, None] * bias + madd[None, :])
        else:
            s = s + madd[None, :]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        P = p / jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)  # f32

        Pc = P.astype(dt)
        dv_ref[0, :, lo:hi] = jax.lax.dot_general(
            Pc, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)  # [Tk, hd]
        dP = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Tq, Tk] f32
        delta = jnp.sum(P * dP, axis=1, keepdims=True)  # [Tq, 1]
        dS = P * (dP - delta)  # f32
        dSc = dS.astype(dt)
        dq_ref[0, :, lo:hi] = (
            jax.lax.dot_general(
                dSc, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sc
        ).astype(dq_ref.dtype)  # [Tq, hd]
        dk_ref[0, :, lo:hi] = (
            jax.lax.dot_general(
                dSc, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sc
        ).astype(dk_ref.dtype)  # [Tk, hd]
        if has_bias:
            dgate_ref[0, h] = jnp.sum(dS * bias, axis=1)  # [Tq] f32
            dbias_ref[h] += gate[:, None] * dS


def _bwd_kernel_nobias(q_r, k_r, v_r, g_r, madd_r, dq_r, dk_r, dv_r, **kw):
    _bwd_kernel(
        q_r, k_r, v_r, g_r, madd_r, None, None, dq_r, dk_r, dv_r, None, None,
        **kw,
    )


def attention_btd_bwd(
    q: jnp.ndarray,  # [B, Tq, D]
    k: jnp.ndarray,  # [B, Tk, D]
    v: jnp.ndarray,
    g: jnp.ndarray,  # [B, Tq, D] upstream cotangent
    num_heads: int,
    key_mask: Optional[jnp.ndarray],
    scale: float,
    gate: Optional[jnp.ndarray],  # [B, H, Tq]
    pos_bias: Optional[jnp.ndarray],  # [H, Tq, Tk]
    interpret: Optional[bool] = None,
) -> Tuple:
    """→ (dq, dk, dv, dgate | None, dbias | None)."""
    B, Tq, D = q.shape
    Tk = k.shape[1]
    H = num_heads
    has_bias = pos_bias is not None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    attention_btd_bwd_budget_check(
        B, Tq, Tk, D, H, q.dtype.itemsize, has_bias
    )
    Tq_p = ((Tq + 127) // 128) * 128
    Tk_p = ((Tk + 127) // 128) * 128

    qp = _pad_axis(q, 1, 128)
    gp = _pad_axis(g, 1, 128)  # zero rows → padded queries contribute 0
    kp = _pad_axis(k, 1, 128)
    vp = _pad_axis(v, 1, 128)

    if key_mask is None:
        key_mask = jnp.ones((B, Tk), jnp.float32)
    NEG_INF = -1e30
    madd = _pad_axis(
        jnp.where(key_mask > 0, 0.0, NEG_INF).astype(jnp.float32), 1, Tk_p,
        pad_value=NEG_INF,
    )[:, None, :]

    in_specs = [
        pl.BlockSpec((1, Tq_p, D), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, Tk_p, D), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, Tk_p, D), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, Tq_p, D), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, 1, Tk_p), lambda b: (b, 0, 0)),
    ]
    inputs = [qp, kp, vp, gp, madd]
    out_specs = [
        pl.BlockSpec((1, Tq_p, D), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, Tk_p, D), lambda b: (b, 0, 0)),
        pl.BlockSpec((1, Tk_p, D), lambda b: (b, 0, 0)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((B, Tq_p, D), q.dtype),
        jax.ShapeDtypeStruct((B, Tk_p, D), k.dtype),
        jax.ShapeDtypeStruct((B, Tk_p, D), v.dtype),
    ]
    if has_bias:
        if gate is None:
            gate = jnp.ones((B, H, Tq), jnp.float32)
        gate_p = _pad_axis(gate, 2, 128)
        bias_p = _pad_axis(_pad_axis(pos_bias, 1, 128), 2, Tk_p).astype(q.dtype)
        in_specs += [
            pl.BlockSpec((1, H, Tq_p), lambda b: (b, 0, 0)),
            pl.BlockSpec((H, Tq_p, Tk_p), lambda b: (0, 0, 0)),
        ]
        inputs += [gate_p, bias_p]
        out_specs += [
            pl.BlockSpec((1, H, Tq_p), lambda b: (b, 0, 0)),
            pl.BlockSpec((H, Tq_p, Tk_p), lambda b: (0, 0, 0)),
        ]
        out_shapes += [
            jax.ShapeDtypeStruct((B, H, Tq_p), jnp.float32),
            jax.ShapeDtypeStruct((H, Tq_p, Tk_p), jnp.float32),
        ]

    kernel = functools.partial(
        _bwd_kernel if has_bias else _bwd_kernel_nobias,
        scale=float(scale), num_heads=H, has_bias=has_bias,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*inputs)

    dq = outs[0][:, :Tq]
    dk = outs[1][:, :Tk]
    dv = outs[2][:, :Tk]
    if has_bias:
        dgate = outs[3][:, :, :Tq]
        dbias = outs[4][:, :Tq, :Tk]
        return dq, dk, dv, dgate, dbias
    return dq, dk, dv, None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def attention_btd_diff(q, k, v, num_heads, scale, interpret, key_mask, gate, pos_bias):
    """One-shot [B,T,D] SDPA with a one-shot Pallas backward.

    Same semantics as ``flash_attention_short.attention_btd`` (which is
    the forward); differentiable wrt q/k/v/gate/pos_bias. Raises
    ``VmemBudgetError`` at trace time when either direction cannot be
    blocked into VMEM — callers fall back to the XLA path.
    """
    return attention_btd(
        q, k, v, num_heads, key_mask=key_mask, scale=scale, gate=gate,
        pos_bias=pos_bias, interpret=interpret,
    )


def _diff_fwd(q, k, v, num_heads, scale, interpret, key_mask, gate, pos_bias):
    # probe the BACKWARD budget at trace time too: a forward that fits but
    # a backward that doesn't must fall back as a pair, not mid-training
    B, Tq, D = q.shape
    attention_btd_bwd_budget_check(
        B, Tq, k.shape[1], D, num_heads, q.dtype.itemsize, pos_bias is not None
    )
    out = attention_btd(
        q, k, v, num_heads, key_mask=key_mask, scale=scale, gate=gate,
        pos_bias=pos_bias, interpret=interpret,
    )
    return out, (q, k, v, key_mask, gate, pos_bias)


def attention_btd_bwd_budget_check(B, Tq, Tk, D, H, itemsize, has_bias):
    """Panels (q,k,v,g in + dq,dk,dv out, double-buffered) + resident bias
    and dbias + ~3 f32 score-tile temporaries must fit the scoped VMEM."""
    Tq_p = ((Tq + 127) // 128) * 128
    Tk_p = ((Tk + 127) // 128) * 128
    est = (
        2 * 7 * max(Tq_p, Tk_p) * D * itemsize
        + (H * Tq_p * Tk_p * (itemsize + 4) if has_bias else 0)
        + 3 * 4 * Tq_p * Tk_p
    )
    if Tk > MAX_ONESHOT_TK or est > _VMEM_BUDGET:
        raise VmemBudgetError(
            f"one-shot attention backward does not fit VMEM at Tq={Tq} "
            f"Tk={Tk} D={D} H={H} has_bias={has_bias} (est {est >> 20} MiB)"
        )


def oneshot_attention_train(
    q: jnp.ndarray,  # [B, Tq, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    key_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    gate: Optional[jnp.ndarray] = None,
    pos_bias: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Public differentiable entry — resolves defaults so the custom_vjp's
    nondiff args are concrete, then dispatches to ``attention_btd_diff``.
    Raises ``VmemBudgetError`` (trace time) when either direction cannot
    be blocked; callers fall back to the XLA path."""
    B, Tq, D = q.shape
    if scale is None:
        scale = (D // num_heads) ** -0.5
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # Budget-check BOTH directions here, not only under differentiation:
    # a non-differentiated call (eval forward of a train_kernels config)
    # at Tk > MAX_ONESHOT_TK would otherwise hit attention_btd's plain
    # assert, bypassing the documented VmemBudgetError -> XLA fallback.
    attention_btd_bwd_budget_check(
        B, Tq, k.shape[1], D, num_heads, q.dtype.itemsize, pos_bias is not None
    )
    # The custom_vjp returns zeros_like(key_mask) as its cotangent; for a
    # bool/int mask JAX would demand float0 instead and jax.grad errors.
    # The kernels only test mask > 0, so a float cast is exact.
    if key_mask is not None and not jnp.issubdtype(key_mask.dtype, jnp.floating):
        key_mask = key_mask.astype(jnp.float32)
    return attention_btd_diff(
        q, k, v, num_heads, float(scale), bool(interpret), key_mask, gate,
        pos_bias,
    )


def _diff_bwd(num_heads, scale, interpret, res, g):
    q, k, v, key_mask, gate, pos_bias = res
    dq, dk, dv, dgate, dbias = attention_btd_bwd(
        q, k, v, g, num_heads, key_mask, scale, gate, pos_bias,
        interpret=interpret,
    )
    dkey_mask = None if key_mask is None else jnp.zeros_like(key_mask)
    dgate_out = None
    if gate is not None and dgate is not None:
        dgate_out = dgate.astype(gate.dtype)
    dbias_out = None
    if pos_bias is not None and dbias is not None:
        dbias_out = dbias.astype(pos_bias.dtype)
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        dkey_mask,
        dgate_out,
        dbias_out,
    )


attention_btd_diff.defvjp(_diff_fwd, _diff_bwd)
