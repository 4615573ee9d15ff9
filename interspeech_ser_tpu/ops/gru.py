"""Bidirectional GRU on TPU via ``jax.lax.scan``.

Gate math and parameter layout follow torch ``nn.GRU`` exactly (gate order
r, z, n; the n-gate hidden bias sits *inside* the reset product) so weights
converted from reference checkpoints reproduce outputs bit-for-bit:

    r_t = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z_t = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n_t = tanh  (W_in x + b_in + r_t * (W_hn h + b_hn))
    h_t = (1 - z_t) * n_t + z_t * h_{t-1}

TPU mapping: the input contribution ``x @ W_ih^T + b_ih`` for ALL timesteps
is one large MXU matmul done outside the scan; the scan body performs a
single fused [B,H] x [H,3H] matmul per step. The recurrence is inherently
serial in T (reference sequences are ≤ ~600 frames; see SURVEY.md §7 hard
part 4).

Masking: with ``mask`` (1 = valid frame), the carry freezes across padded
steps, so a padded batched run equals per-utterance unpadded runs — this is
what makes batched eval equal the reference's batch-1 eval
(reference: bin/eval_cat_bimodal_lazy_1head.py:292).

Reference model usage: bin/train_cat_bimodal_lazy_1head.py:255-266.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Trace-time mesh context (shared with attention — see
# ops/kernel_context.py): on a >1-device mesh BiGRU wraps the Pallas
# recurrence in a nested ``jax.shard_map`` over the 'data' axis — exact
# for the GRU (a per-sample op along batch), and differentiable:
# shard_map's transpose psums the replicated recurrent-weight cotangents.
from .kernel_context import active_kernel_mesh as _active_kernel_mesh
from .kernel_context import kernel_mesh as gru_kernel_mesh  # back-compat name


def gru_scan(
    x: jnp.ndarray,
    h0: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    b_ih: jnp.ndarray,
    b_hh: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    reverse: bool = False,
) -> jnp.ndarray:
    """Single-direction GRU.

    Args:
        x: [B, T, I] inputs.
        h0: [B, H] initial hidden state.
        w_ih: [I, 3H] input kernel (transposed torch ``weight_ih_l0``).
        w_hh: [H, 3H] hidden kernel (transposed torch ``weight_hh_l0``).
        b_ih, b_hh: [3H] biases.
        mask: optional [B, T] validity mask (1 = real frame).
        reverse: run right-to-left (the torch ``_reverse`` direction).

    Returns:
        [B, T, H] hidden states (zeros at masked positions).
    """
    B, T, _ = x.shape
    H = h0.shape[-1]
    compute_dtype = x.dtype

    # One big MXU matmul for every timestep's input contribution.
    x_proj = (
        jax.lax.dot_general(
            x, w_ih.astype(compute_dtype), (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b_ih.astype(jnp.float32)
    )  # [B, T, 3H] in f32

    if mask is None:
        mask_t = jnp.ones((B, T, 1), dtype=jnp.float32)
    else:
        mask_t = mask.astype(jnp.float32)[:, :, None]

    xs = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 3H]
    ms = jnp.swapaxes(mask_t, 0, 1)  # [T, B, 1]

    w_hh_f = w_hh.astype(jnp.float32)
    b_hh_f = b_hh.astype(jnp.float32)

    def step(h, inputs):
        xp, m = inputs  # [B, 3H], [B, 1]
        hp = (
            jnp.dot(h, w_hh_f, preferred_element_type=jnp.float32) + b_hh_f
        )  # [B, 3H]
        xr, xz, xn = xp[:, :H], xp[:, H : 2 * H], xp[:, 2 * H :]
        hr, hz, hn = hp[:, :H], hp[:, H : 2 * H], hp[:, 2 * H :]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        h_next = m * h_new + (1.0 - m) * h  # freeze carry on padding
        return h_next, h_next * m  # zero output at padded frames

    h0_f = h0.astype(jnp.float32)
    # unroll=8: the recurrence is latency-bound per sequential step;
    # unrolling amortizes the per-step scheduling overhead — measured
    # 44.2 → 29.4 ms/step (-33%) on the production fusion train step
    # (bs 64, T=512+80) on v5e; unroll=16 regresses (35 ms).
    _, ys = jax.lax.scan(step, h0_f, (xs, ms), reverse=reverse, unroll=8)
    return jnp.swapaxes(ys, 0, 1).astype(compute_dtype)  # [B, T, H]


def gru_scan_bidir_stacked(
    x: jnp.ndarray,
    h0: jnp.ndarray,
    params_fwd,
    params_bwd,
    mask: Optional[jnp.ndarray] = None,
    unroll: int = 8,
) -> jnp.ndarray:
    """Both GRU directions in ONE ``lax.scan``.

    The two directions are independent, but two separate scans execute
    *serially* on TPU (XLA schedules one op at a time per core), so the
    latency-bound recurrence pays 2T sequential steps. Stacking the
    directions on a leading [2] batch dim (the backward direction's
    inputs/mask pre-reversed along T) runs T steps that each do both
    directions' small matmuls — same math, up to ~2x less serial
    latency. Pure XLA: differentiable and GSPMD-partitionable, unlike
    the Pallas kernel path. Returns [B, T, 2H] = concat(fwd, bwd),
    bit-identical to two ``gru_scan`` calls (shared-f32 gate math).
    """
    B, T, _ = x.shape
    H = h0.shape[-1]
    compute_dtype = x.dtype
    w_ih_f, w_hh_f, b_ih_f, b_hh_f = params_fwd
    w_ih_b, w_hh_b, b_ih_b, b_hh_b = params_bwd

    def proj(w_ih, b_ih):
        return (
            jax.lax.dot_general(
                x, w_ih.astype(compute_dtype), (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + b_ih.astype(jnp.float32)
        )  # [B, T, 3H] f32

    xp = jnp.stack([proj(w_ih_f, b_ih_f), proj(w_ih_b, b_ih_b)[:, ::-1]])
    if mask is None:
        m2 = jnp.ones((2, B, T, 1), jnp.float32)
    else:
        m = mask.astype(jnp.float32)[:, :, None]
        m2 = jnp.stack([m, m[:, ::-1]])
    xs = jnp.moveaxis(xp, 2, 0)  # [T, 2, B, 3H]
    ms = jnp.moveaxis(m2, 2, 0)  # [T, 2, B, 1]

    w_hh2 = jnp.stack([w_hh_f, w_hh_b]).astype(jnp.float32)  # [2, H, 3H]
    b_hh2 = jnp.stack([b_hh_f, b_hh_b]).astype(jnp.float32)[:, None]  # [2,1,3H]

    def step(h, inputs):
        xp_t, m_t = inputs  # [2, B, 3H], [2, B, 1]
        hp = (
            jax.lax.dot_general(
                h, w_hh2, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            + b_hh2
        )  # [2, B, 3H]
        r = jax.nn.sigmoid(xp_t[..., :H] + hp[..., :H])
        z = jax.nn.sigmoid(xp_t[..., H : 2 * H] + hp[..., H : 2 * H])
        n = jnp.tanh(xp_t[..., 2 * H :] + r * hp[..., 2 * H :])
        h_new = (1.0 - z) * n + z * h
        h_next = m_t * h_new + (1.0 - m_t) * h
        return h_next, h_next * m_t

    h0_2 = jnp.broadcast_to(h0.astype(jnp.float32), (2, B, H))
    _, ys = jax.lax.scan(step, h0_2, (xs, ms), unroll=unroll)
    ys = jnp.moveaxis(ys, 0, 2)  # [2, B, T, H]
    out = jnp.concatenate([ys[0], ys[1, :, ::-1]], axis=-1)
    return out.astype(compute_dtype)


class BiGRU(nn.Module):
    """torch-layout bidirectional single-layer GRU.

    Parameters mirror torch naming for painless checkpoint conversion:
    ``w_ih_fwd``/``w_hh_fwd``/``b_ih_fwd``/``b_hh_fwd`` and ``*_bwd`` are the
    transposed torch ``weight_ih_l0``/``weight_hh_l0``/``bias_*`` (+``_reverse``).
    Output is [B, T, 2H] = concat(forward, backward).
    """

    hidden_dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        use_kernel: bool = False,
    ) -> jnp.ndarray:
        in_dim = x.shape[-1]
        H = self.hidden_dim
        # torch init: U(-1/sqrt(H), 1/sqrt(H)) for every GRU tensor.
        bound = 1.0 / (H ** 0.5)

        def u_init(key, shape, dtype=self.param_dtype):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        params = {}
        for d in ("fwd", "bwd"):
            params[d] = (
                self.param(f"w_ih_{d}", u_init, (in_dim, 3 * H)),
                self.param(f"w_hh_{d}", u_init, (H, 3 * H)),
                self.param(f"b_ih_{d}", u_init, (3 * H,)),
                self.param(f"b_hh_{d}", u_init, (3 * H,)),
            )

        B = x.shape[0]
        h0 = jnp.zeros((B, H), dtype=jnp.float32)
        if use_kernel:
            # fused path: both directions ride ONE Pallas kernel — the
            # recurrence is latency-bound, so stacking fwd + (reversed)
            # bwd along batch doubles work per step at the same serial
            # latency (22% faster already single-direction vs lax.scan on
            # v5e; ~2x with the direction stack). Differentiable: the
            # kernel carries a custom_vjp (pallas/gru_kernel.py), so this
            # serves training too — but only on a SINGLE device (a Pallas
            # custom call does not auto-partition under GSPMD).
            def proj(x_, w_ih, b_ih):
                return (
                    jax.lax.dot_general(
                        x_, w_ih.astype(x.dtype), (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    + b_ih.astype(jnp.float32)
                )

            m = jnp.ones((B, x.shape[1]), jnp.float32) if mask is None else mask
            xp_f = proj(x, params["fwd"][0], params["fwd"][2])
            xp_b = proj(x, params["bwd"][0], params["bwd"][2])[:, ::-1]
            m_b = m[:, ::-1]
            from .pallas.gru_kernel import gru_sequence_bidir

            w_hh2 = jnp.stack([params["fwd"][1], params["bwd"][1]])  # [2, H, 3H]
            b_hh2 = jnp.stack([params["fwd"][3], params["bwd"][3]])

            def run_local(xp_f_, xp_b_, m_f_, m_b_, w_, b_):
                # per-shard body: concat directions along batch, one kernel
                # call, split + un-reverse. Batch-local math throughout, so
                # a sharded run equals the single-device call row-for-row.
                half = xp_f_.shape[0]
                xp = jnp.concatenate([xp_f_, xp_b_], axis=0)  # [2b, T, 3H]
                mm = jnp.concatenate([m_f_, m_b_], axis=0)
                out = gru_sequence_bidir(xp, w_, b_, mm, half)
                return jnp.concatenate([out[:half], out[half:, ::-1]], axis=-1)

            from .attention_core import under_manual_axis

            mesh = _active_kernel_mesh()
            if mesh is not None and mesh.size > 1 and not under_manual_axis():
                # (the under_manual_axis guard mirrors attention_core's: if a
                # caller is already tracing per-shard inside a shard_map, the
                # kernel is plain local compute — nesting another shard_map
                # over 'data' would fail.)
                # nested shard_map: the surrounding train step stays GSPMD
                # (global loss/optimizer math untouched); only the Pallas
                # recurrence runs per-shard over the data axis. Replicated
                # w_hh2/b_hh2 cotangents are psum'd by shard_map's transpose
                # (gradient 1-dev == n-dev parity tested in
                # tests/test_e2e_fusion.py::TestKernelDataParallel).
                from jax.sharding import PartitionSpec as P

                run = jax.shard_map(
                    run_local, mesh=mesh,
                    in_specs=(P("data"), P("data"), P("data"), P("data"), P(), P()),
                    out_specs=P("data"), check_vma=False,
                )
            else:
                run = run_local
            return run(xp_f, xp_b, m, m_b, w_hh2, b_hh2)

        # direction-stacked single scan: numerically identical, halves the
        # sequential step count. Opt-in until the hardware A/B
        # (scripts/exp_gru_stack.py) decides the production default.
        if os.environ.get("SER_TPU_GRU_STACK") == "1":
            return gru_scan_bidir_stacked(
                x, h0, params["fwd"], params["bwd"], mask
            )
        fwd = gru_scan(x, h0, *params["fwd"], mask=mask, reverse=False)
        bwd = gru_scan(x, h0, *params["bwd"], mask=mask, reverse=True)
        return jnp.concatenate([fwd, bwd], axis=-1)
