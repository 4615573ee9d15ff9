"""One-shot VMEM attention for the encoder-zoo's short-sequence regime.

The encoder zoo runs attention at Tk ≤ ~1504 (WavLM/HuBERT/XLS-R ~499
frames, Whisper 1500; SURVEY.md §5 'long-context'): the ENTIRE [Tk, hd]
K/V panel for one (batch, head) fits VMEM, so no flash recurrence is
needed — each kernel instance computes a full softmax row block in one
pass. Compared to the generic flash kernel (flash_attention.py) this
removes the m/l running-max bookkeeping; compared to the XLA path it
never materializes the [B,H,Tq,Tk] scores or the gated relative position
bias in HBM (the v5e trace showed ~21 ms/step of score matmuls at ~32
TF/s plus ~8 ms of softmax HBM passes for WavLM-large B32).

Key structural points:
- grid (B, n_q, H), per-(batch, head) q/k/v blocks — each slice is
  fetched exactly once, so HBM traffic is q+k+v+out+bias ≈ 140 MB/layer
  at WavLM-large B32 vs ~1 GB for the materializing XLA path.
- WavLM's shared position bias [H, Tq, Tk] rides in as ONE full-H block
  with a constant index map: Pallas fetches it once per q block (not per
  head — consecutive same-index blocks are not re-copied) and the kernel
  slices the current head on an UNTILED leading dim (dynamic indexing on
  tiled sublane/lane dims is what Mosaic forbids).
- the per-(b,h,q) gate stays factored (gate · bias) and is applied to
  the score tile in VMEM (reference semantics: models/speech.py
  gru_rel_pos gating).

MEASURED RESULTS (v5e, WavLM-large, bf16):
- v1 ``attention_bhtd`` (grid (B, nq, H), [B,H,T,hd] blocks): isolated
  kernel 2.51 ms vs XLA 2.66 ms (~6% faster), but END-TO-END extraction
  REGRESSED 220.8 vs 254.9 utt/s — the custom call forces [B,H,T,hd]
  layout materialization of q/k/v/out and breaks XLA's fusion of the
  projection chain. Kept as a tested opt-in (SER_TPU_ATTN_IMPL=oneshot).
- v2 ``attention_btd`` (grid (B, nq), [B,T,D] projection-layout panels,
  unrolled in-kernel head sweep, mask pre-folded additive, ~4 VPU
  passes instead of ~8): end-to-end WavLM extraction 274.2 vs 252.9
  utt/s (+8.4%, scripts/exp_attn_btd.py + bench_zoo A/B). This is the
  DEFAULT for single-device bf16 TPU runs (attention_core.
  dot_product_attention_btd); sharded meshes keep XLA because a Pallas
  custom call does not auto-partition under GSPMD.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30
LOG2E = math.log2(math.e)

# Softmax-chain micro-optimizations inside the one-shot kernel, decided
# by the in-stack ablation (scripts/exp_stack_anatomy.py: softmax is
# ~6 ms of the 40 ms WavLM-24L stack at B16 even WITH the kernel; every
# removed VPU pass over the [bq, Tk] f32 score tile is visible e2e).
# Comma set, overridable via SER_TPU_SOFTMAX_OPT:
#   exp2 — rebase the f32 logit tile by log2(e) (FMA fused into the adds)
#          and call exp2, the VPU's native transcendental, directly;
#   psum — round P to the compute dtype BEFORE the row-sum, so exp writes
#          half-width and the separate f32->bf16 cast pass disappears;
#          the softmax stays exactly normalized over the ROUNDED weights
#          actually fed to the PV matmul (identity in f32 mode);
#   fused — never materialize the shifted score tile: fold gate*bias+mask
#          into the max reduce and the exp pass as recomputed elementwise
#          expressions (trades one f32 R/W pass for a second bf16 bias
#          read).
# MEASURED (v5e): at the WavLM 24-layer stack every combination lands
# within 0.4% (39.66-39.82 ms, B16 bf16, scripts/exp_softmax_opt.py) with
# bit-identical worst-case error vs f32 truth (1.28e-2, == baseline) —
# Mosaic already fuses the elementwise chains there. At the WHISPER shape
# (B8 H20 T1500 hd64, no bias — 5.6x the f32 score-tile volume per layer)
# 'fused' is a real +10% on the isolated SDPA (4.27 → 3.88 ms,
# scripts/exp_whisper_flash.py r04) because the never-materialized
# shifted tile drops one full f32 R/W pass that the small-tile regime
# hid in fusion slack; exp2/psum stay dead even there too. The default is
# therefore PER-PATH: 'fused' on the no-bias path (whisper's regime; the
# gated-bias wavlm A/B read 291.2 vs 288.7 utt/s — inside noise but not
# a win, so the bias path stays plain). Env var still overrides both.
DEFAULT_SOFTMAX_OPT = ""
DEFAULT_SOFTMAX_OPT_NOBIAS = "fused"


def _softmax_opt_flags(default: Optional[str] = None) -> frozenset:
    raw = os.environ.get("SER_TPU_SOFTMAX_OPT")
    if raw is None:
        raw = DEFAULT_SOFTMAX_OPT if default is None else default
    flags = frozenset(f for f in raw.replace(" ", "").split(",") if f)
    unknown = flags - {"exp2", "psum", "fused", "nomax"}
    if unknown:
        raise ValueError(f"SER_TPU_SOFTMAX_OPT: unknown flags {sorted(unknown)}")
    return flags


class VmemBudgetError(ValueError):
    """Raised when a shape cannot be blocked into the VMEM budget; the
    attention-core dispatcher falls back to the XLA path."""


def _kernel(
    q_ref,  # [1, 1, bq, hd]
    k_ref,  # [1, 1, Tk, hd]
    v_ref,  # [1, 1, Tk, hd]
    mask_ref,  # [1, 1, Tk]
    gate_ref,  # [1, 1, bq] or absent
    bias_ref,  # [H, bq, Tk] or absent (full-H, VMEM-resident across heads)
    out_ref,  # [1, 1, bq, hd]
    *,
    scale: float,
    has_bias: bool,
):
    q = q_ref[0, 0]  # [bq, hd]
    k = k_ref[0, 0]  # [Tk, hd]
    v = v_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, Tk] f32

    if has_bias:
        h = pl.program_id(2)
        gate = gate_ref[0, 0].astype(jnp.float32)  # [bq]
        bias = bias_ref[h].astype(jnp.float32)  # [bq, Tk] — untiled-dim slice
        s = s + gate[:, None] * bias

    mask = mask_ref[0, 0].astype(jnp.float32)  # [Tk]
    s = jnp.where(mask[None, :] > 0, s, NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, hd] f32
    out_ref[0, 0] = (o / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


def _kernel_nobias(q_ref, k_ref, v_ref, mask_ref, out_ref, **kw):
    _kernel(q_ref, k_ref, v_ref, mask_ref, None, None, out_ref, **kw)


def _pad_axis(
    x: jnp.ndarray, axis: int, multiple: int, pad_value: float = 0.0
) -> jnp.ndarray:
    size = x.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads, constant_values=pad_value)


# VMEM budget at the WavLM ceiling (T=512, H=16, bq=512): bias panel
# [16,512,512] bf16 = 8 MB + scores f32 [512,512] ×2 = 2 MB + q/k/v/out
# blocks [512,64] ≈ 0.3 MB — ~10.5 MB of the ~16 MB/core VMEM. Whisper
# (no bias, T=1536) is far under.
MAX_ONESHOT_TK = 2048

# full-D blocking is preferred below this estimate (K/V fetched once per
# batch row and shared by every head); the scoped-VMEM compiler limit is
# raised to _VMEM_LIMIT accordingly (v5e: 128 MiB physical)
_VMEM_BUDGET = 32 * 2 ** 20
_VMEM_LIMIT = 64 * 2 ** 20


def _kernel_btd(
    q_ref,  # [1, bq, D] — full projection panel, D = H·hd
    k_ref,  # [1, Tk, D]
    v_ref,  # [1, Tk, D]
    madd_ref,  # [1, 1, Tk] additive mask (0 attend / -1e9 masked) or absent
    gate_ref,  # [1, H, bq] or absent
    bias_ref,  # [H, bq, Tk] or absent (full-H, VMEM-resident across b)
    out_ref,  # [1, bq, D]
    *,
    scale: float,
    has_bias: bool,
    has_mask: bool = True,
    n_pad_k: int = 0,
    num_heads: int,
    opts: frozenset = frozenset(),
):
    """One-shot SDPA on projection-layout panels, minimal VPU passes.

    Differences vs ``_kernel`` (measured VPU-bound at ~8 elementwise
    passes over the [bq, Tk] f32 tile):
    - mask arrives pre-folded as an additive bias → no ``where`` pass;
    - scale is applied to the small [bq, hd] q slice, not the score tile;
    - bias+gate+mask fold into ONE fused elementwise expression;
    - the head sweep is an unrolled in-kernel loop over STATIC lane
      slices of [bq, D] panels, so q/k/v/out stay in the layout the
      projections produce (no transposes around the custom call — the
      v1 kernel's e2e regression) and K/V panels are fetched once per
      batch row, not once per head.

    MASKLESS fast path (``has_mask=False`` — whisper's fixed 30-s windows
    pass no key mask): the [Tk] madd broadcast-add over the f32 score
    tile disappears entirely. Keys lane-padded to the 128 tile still need
    neutralizing: zero-padded V rows add nothing to the numerator, and
    the denominator is summed over ONLY the real lane slice
    (``l = Σ p[:, :Tk-n_pad]`` — a static slice folded into the reduce,
    no extra pass). Exact in f32 by softmax shift-invariance even when
    the padded zero scores dominate the row max. (An earlier analytic
    fixup ``l -= n_pad·exp(-m)`` was CATASTROPHICALLY WRONG when a row's
    real scores sat far below 0 — m = 0 from the pads, the fixup
    cancelled the entire f32 sum, and the clamped denominator exploded
    the output ~1e20; found by review, pinned in
    tests/test_flash_attention.py::test_maskless_all_negative_scores.)
    """
    D = q_ref.shape[-1]
    hd = D // num_heads
    exp2 = "exp2" in opts
    expfn = jnp.exp2 if exp2 else jnp.exp
    madd = madd_ref[0, 0].astype(jnp.float32) if has_mask else None  # [Tk]
    # exp2 mode: the finished f32 logit tile is rebased by log2(e) as one
    # multiply FUSED into the add/max/exp passes already present — never
    # folded into the bf16 q scale or the bf16 bias panel, where the
    # non-power-of-2 factor costs 2^-9 rounding on every logit (measured
    # 2.4x the baseline kernel's error vs f32 truth).
    sc = jnp.asarray(scale, q_ref.dtype)
    log2e = jnp.float32(LOG2E if exp2 else 1.0)
    for h in range(num_heads):
        lo, hi = h * hd, (h + 1) * hd
        q = q_ref[0, :, lo:hi] * sc  # [bq, hd]
        k = k_ref[0, :, lo:hi]  # [Tk, hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, Tk] f32
        if has_bias:
            gate = gate_ref[0, h].astype(jnp.float32)  # [bq]
            bias = bias_ref[h].astype(jnp.float32)  # [bq, Tk]
            add = gate[:, None] * bias
            if has_mask:
                add = add + madd[None, :]
        elif has_mask:
            add = madd[None, :]
        else:
            add = None
        if add is None and "nomax" in opts:
            # EXPERIMENT (unsafe in general): skip the max-shift reduce.
            # exp(s) overflows f32 at s > ~88 — fine for LayerNorm'd
            # encoder activations (|s| ≲ 10) but silently wrong on
            # adversarial inputs, so never a default. Padded key columns
            # are excluded from l by the real-slice sum below.
            p = expfn(s * log2e)
        elif add is None:
            m = jnp.max(s, axis=1, keepdims=True)
            p = expfn((s - m) * log2e)
        elif "fused" in opts:
            # shifted tile never hits VMEM: the add recomputes inside the
            # max reduce and the exp pass (elementwise-into-reduce fusion)
            m = jnp.max(s + add, axis=1, keepdims=True)
            p = expfn(((s - m) + add) * log2e)
        else:
            s = s + add
            m = jnp.max(s, axis=1, keepdims=True)
            p = expfn((s - m) * log2e)
        # maskless + padded keys: the denominator sums ONLY the real
        # columns (static slice; padded p values never enter l, and
        # padded V rows are zero so they never enter the numerator)
        p_l = p[:, : p.shape[1] - n_pad_k] if (not has_mask and n_pad_k) else p
        if "psum" in opts:
            # round P first; l then normalizes the exact weights the PV
            # matmul consumes (f32 accumulation over the rounded P)
            p = p.astype(v_ref.dtype)
            p_l = p_l.astype(v_ref.dtype)
            l = jnp.sum(p_l, axis=1, keepdims=True, dtype=jnp.float32)
        else:
            l = jnp.sum(p_l, axis=1, keepdims=True)
            p = p.astype(v_ref.dtype)
        o = jax.lax.dot_general(
            p, v_ref[0, :, lo:hi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, hd] f32
        out_ref[0, :, lo:hi] = (o / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


def _kernel_btd_nobias(q_ref, k_ref, v_ref, madd_ref, out_ref, **kw):
    _kernel_btd(q_ref, k_ref, v_ref, madd_ref, None, None, out_ref, **kw)


def _kernel_btd_nobias_nomask(q_ref, k_ref, v_ref, out_ref, **kw):
    _kernel_btd(q_ref, k_ref, v_ref, None, None, None, out_ref, **kw)


def _kernel_btd_bias_nomask(q_ref, k_ref, v_ref, gate_ref, bias_ref, out_ref, **kw):
    _kernel_btd(q_ref, k_ref, v_ref, None, gate_ref, bias_ref, out_ref, **kw)


def attention_btd(
    q: jnp.ndarray,  # [B, Tq, D] — projection layout, D = H * hd
    k: jnp.ndarray,  # [B, Tk, D]
    v: jnp.ndarray,  # [B, Tk, D]
    num_heads: int,
    key_mask: Optional[jnp.ndarray] = None,  # [B, Tk], 1 = attend
    scale: Optional[float] = None,
    gate: Optional[jnp.ndarray] = None,  # [B, H, Tq] factored-bias gate
    pos_bias: Optional[jnp.ndarray] = None,  # [H, Tq, Tk] shared bias
    block_q: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:  # [B, Tq, D]
    """One-shot masked SDPA straight on [B, T, D] projection outputs.

    Heads are column slices selected by the BlockSpec index map (lane
    offset h*hd), so q/k/v/out never leave the layout the projections
    produce — the v1 kernel's [B, H, T, hd] transposes (which cost more
    e2e than the kernel saved) disappear entirely.
    """
    B, Tq, D = q.shape
    Tk = k.shape[1]
    H = num_heads
    assert D % H == 0
    hd = D // H
    assert Tk <= MAX_ONESHOT_TK, f"Tk={Tk}: use the recurrent flash kernel"
    if scale is None:
        scale = hd ** -0.5
    has_bias = pos_bias is not None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    opts = _softmax_opt_flags(
        default=DEFAULT_SOFTMAX_OPT if has_bias else DEFAULT_SOFTMAX_OPT_NOBIAS
    )
    # experiment knob: override the q-block size (scripts/exp_blockq.py).
    # Zero-default — production always takes the 512 path chosen by the
    # VMEM budgeting below.
    env_bq = os.environ.get("SER_TPU_ONESHOT_BLOCK_Q")
    if env_bq:
        block_q = int(env_bq)
    elif key_mask is None:
        # maskless swept optimum AND a VMEM necessity: at the whisper
        # shape (B8 T1500 D1280) the maskless kernel at bq=512 exceeds
        # the 64 MiB scoped limit by 3.15 MiB (Mosaic's real allocation
        # runs ~2.5x the analytic estimate below), while bq=256 both fits
        # and measures fastest (3.91 vs 4.13 ms masked@512 —
        # scripts/exp_whisper_flash.py r04 sweep).
        block_q = min(block_q, 256)

    block_q = min(block_q, ((Tq + 127) // 128) * 128)
    # VMEM at bq: q/out panels 2·bq·D + k/v panels 2·Tk·D (dtype bytes,
    # double-buffered ×2) + resident bias H·bq·Tk + 2 f32 score tiles
    itemsize = q.dtype.itemsize

    # VMEM estimate (double-buffered q/out and k/v panels, resident bias,
    # two f32 score tiles). v5e has 128 MiB physical VMEM; the compiler's
    # default scoped limit is 16 MiB, raised below via CompilerParams.
    def vmem_full_d(bq: int) -> int:
        return (
            2 * 2 * (bq + Tk) * D * itemsize
            + (H * bq * Tk * itemsize if has_bias else 0)
            + 8 * bq * Tk
        )

    while block_q > 128 and vmem_full_d(block_q) > _VMEM_BUDGET:
        block_q //= 2
    full_d_fits = vmem_full_d(block_q) <= _VMEM_BUDGET

    # lane-blocked fallback (very large D·Tk, no bias): block width =
    # the smallest multiple of 128 covering whole heads
    lane_w = (hd * 128) // math.gcd(hd, 128)
    if not full_d_fits and (has_bias or D % lane_w != 0):
        raise VmemBudgetError(
            f"one-shot BTD attention does not fit VMEM at Tq={Tq} Tk={Tk} "
            f"D={D} has_bias={has_bias}"
        )

    qp = _pad_axis(q, 1, block_q)
    kp = _pad_axis(k, 1, 128)
    vp = _pad_axis(v, 1, 128)
    Tq_p, Tk_p = qp.shape[1], kp.shape[1]
    n_q = Tq_p // block_q

    # MASKLESS fast path: no [Tk] madd pass at all — padded key columns
    # are neutralized by summing the softmax denominator over ONLY the
    # real lane slice (l = Σ p[:, :Tk], a static slice folded into the
    # reduce; see _kernel_btd docstring for why the earlier analytic
    # l -= n_pad·exp(-m) fixup was wrong and must not come back).
    has_mask = key_mask is not None
    n_pad_k = Tk_p - Tk
    if has_mask:
        # additive mask: 0 = attend, NEG_INF = masked (padded keys included)
        madd = _pad_axis(
            jnp.where(key_mask > 0, 0.0, NEG_INF).astype(jnp.float32), 1, Tk_p,
            pad_value=NEG_INF,
        )[:, None, :]

    if full_d_fits:
        in_specs = [
            pl.BlockSpec((1, block_q, D), lambda b, iq: (b, iq, 0)),
            pl.BlockSpec((1, Tk_p, D), lambda b, iq: (b, 0, 0)),
            pl.BlockSpec((1, Tk_p, D), lambda b, iq: (b, 0, 0)),
        ]
        inputs = [qp, kp, vp]
        if has_mask:
            in_specs += [pl.BlockSpec((1, 1, Tk_p), lambda b, iq: (b, 0, 0))]
            inputs += [madd]
        if has_bias:
            if gate is None:
                gate = jnp.ones((B, H, Tq), jnp.float32)
            gate_p = _pad_axis(gate, 2, block_q)  # [B, H, Tq_p]
            bias_p = _pad_axis(
                _pad_axis(pos_bias, 1, block_q), 2, Tk_p
            ).astype(q.dtype)
            in_specs += [
                pl.BlockSpec((1, H, block_q), lambda b, iq: (b, 0, iq)),
                pl.BlockSpec((H, block_q, Tk_p), lambda b, iq: (0, iq, 0)),
            ]
            inputs += [gate_p, bias_p]
            body = _kernel_btd if has_mask else _kernel_btd_bias_nomask
        else:
            body = _kernel_btd_nobias if has_mask else _kernel_btd_nobias_nomask
        kernel = functools.partial(
            body, scale=float(scale), has_bias=has_bias, has_mask=has_mask,
            n_pad_k=n_pad_k, num_heads=H, opts=opts,
        )
        grid = (B, n_q)
        out_spec = pl.BlockSpec((1, block_q, D), lambda b, iq: (b, iq, 0))
    else:
        # grid (b, head-block, iq): K/V lane panels stay resident across
        # the query sweep; each call handles lane_w // hd whole heads
        n_hb = D // lane_w
        in_specs = [
            pl.BlockSpec((1, block_q, lane_w), lambda b, hb, iq: (b, iq, hb)),
            pl.BlockSpec((1, Tk_p, lane_w), lambda b, hb, iq: (b, 0, hb)),
            pl.BlockSpec((1, Tk_p, lane_w), lambda b, hb, iq: (b, 0, hb)),
        ]
        inputs = [qp, kp, vp]
        if has_mask:
            in_specs += [pl.BlockSpec((1, 1, Tk_p), lambda b, hb, iq: (b, 0, 0))]
            inputs += [madd]
        kernel = functools.partial(
            _kernel_btd_nobias if has_mask else _kernel_btd_nobias_nomask,
            scale=float(scale), has_bias=False, has_mask=has_mask,
            n_pad_k=n_pad_k, num_heads=lane_w // hd, opts=opts,
        )
        grid = (B, n_hb, n_q)
        out_spec = pl.BlockSpec((1, block_q, lane_w), lambda b, hb, iq: (b, iq, hb))

    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, Tq_p, D), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*inputs)
    return out[:, :Tq]


def attention_bhtd(
    q: jnp.ndarray,  # [B, H, Tq, hd]
    k: jnp.ndarray,  # [B, H, Tk, hd]
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,  # [B, Tk], 1 = attend
    scale: Optional[float] = None,
    gate: Optional[jnp.ndarray] = None,  # [B, H, Tq] factored-bias gate
    pos_bias: Optional[jnp.ndarray] = None,  # [H, Tq, Tk] shared bias
    block_q: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:  # [B, H, Tq, hd]
    """One-shot masked SDPA with factored bias; f32 softmax in VMEM."""
    B, H, Tq, hd = q.shape
    Tk = k.shape[2]
    assert Tk <= MAX_ONESHOT_TK, f"Tk={Tk}: use the recurrent flash kernel"
    if scale is None:
        scale = hd ** -0.5
    has_bias = pos_bias is not None
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    block_q = min(block_q, ((Tq + 127) // 128) * 128)
    if has_bias:
        # keep the full-H resident bias panel + 2 f32 score tiles ≤ ~12 MB
        while block_q > 128 and (
            H * block_q * Tk * q.dtype.itemsize + 8 * block_q * Tk
        ) > 12 * 2 ** 20:
            block_q //= 2
    qp = _pad_axis(q, 2, block_q)
    # pad K/V time to the 128-lane tile; padded keys are masked out below
    kp = _pad_axis(k, 2, 128)
    vp = _pad_axis(v, 2, 128)
    Tq_p, Tk_p = qp.shape[2], kp.shape[2]
    n_q = Tq_p // block_q

    if key_mask is None:
        key_mask = jnp.ones((B, Tk), jnp.float32)
    mask_p = _pad_axis(key_mask.astype(jnp.float32), 1, Tk_p)[:, None, :]

    in_specs = [
        pl.BlockSpec((1, 1, block_q, hd), lambda b, iq, h: (b, h, iq, 0)),
        pl.BlockSpec((1, 1, Tk_p, hd), lambda b, iq, h: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, Tk_p, hd), lambda b, iq, h: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, Tk_p), lambda b, iq, h: (b, 0, 0)),
    ]
    inputs = [qp, kp, vp, mask_p]
    if has_bias:
        if gate is None:
            gate = jnp.ones((B, H, Tq), jnp.float32)
        # [B·H, 1, Tq_p]: legal (1, 1, bq) tiling needs a singleton sublane
        gate_p = _pad_axis(gate, 2, block_q).reshape(B * H, 1, Tq_p)
        # bias in the compute dtype; constant-in-(b,h) index map → fetched
        # once per q block and kept VMEM-resident across the B·H sweeps
        bias_p = _pad_axis(_pad_axis(pos_bias, 1, block_q), 2, Tk_p).astype(q.dtype)
        in_specs += [
            pl.BlockSpec(
                (1, 1, block_q),
                lambda b, iq, h: (b * pl.num_programs(2) + h, 0, iq),
            ),
            pl.BlockSpec((H, block_q, Tk_p), lambda b, iq, h: (0, iq, 0)),
        ]
        inputs += [gate_p, bias_p]

    kernel = functools.partial(
        _kernel if has_bias else _kernel_nobias,
        scale=float(scale), has_bias=has_bias,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, n_q, H),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, hd), lambda b, iq, h: (b, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Tq_p, hd), q.dtype),
        interpret=interpret,
    )(*inputs)
    return out[:, :, :Tq]
