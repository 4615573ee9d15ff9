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

MEASURED RESULT (v5e, WavLM-large SDPA shape B32/H16/T499/hd64, bf16):
isolated kernel 2.51 ms vs XLA 2.66 ms (~6% faster; a head-batched
hb=4 variant measured 2.56 — within noise). But END-TO-END WavLM
extraction REGRESSES: 220.8 utt/s with the kernel vs 254.9 with XLA —
the custom call forces [B,H,T,hd] layout materialization of q/k/v/out
and breaks XLA's fusion of the projections/score chain, which costs
more than the kernel saves. Both kernels are VPU-bound on the softmax
elementwise passes (~8 passes over the [512,512] f32 tile per head),
not on the score matmuls, so there is little headroom to win back.
Hence XLA remains the production default (see attention_core.pick_impl)
and this kernel is kept as a tested opt-in (SER_TPU_ATTN_IMPL=oneshot)
for memory-bound regimes, mirroring the round-2 recurrent-flash result
(197 vs 248 utt/s).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


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


def _pad_axis(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)


# VMEM budget at the WavLM ceiling (T=512, H=16, bq=512): bias panel
# [16,512,512] bf16 = 8 MB + scores f32 [512,512] ×2 = 2 MB + q/k/v/out
# blocks [512,64] ≈ 0.3 MB — ~10.5 MB of the ~16 MB/core VMEM. Whisper
# (no bias, T=1536) is far under.
MAX_ONESHOT_TK = 2048


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
