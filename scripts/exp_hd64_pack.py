#!/usr/bin/env python
"""hd=64 SDPA "half-fill": measure whether head packing can reclaim it.

Round-3 VERDICT item #2 proposed packing TWO hd=64 heads into one
128-lane contraction inside oneshot2. The algebra says that cannot win:

- QK^T (contraction = hd): S_h = Q_h·K_h^T needs a DIFFERENT K per
  head, so two heads can only share one GEMM via zero block-diagonal
  operands — the zeros waste exactly the 50% the packing was meant to
  recover. Lane-concatenating q/k of two heads computes S_h1 + S_h2
  (cross-head sum) — wrong math.
- PV (output lanes = hd): [P_h1|P_h2] @ blockdiag(V_h1, V_h2) is exact,
  but the block-diag doubles the contraction for the same output → the
  MXU passes are identical to two padded hd→128 matmuls.

The MXU cost model behind both: time ≈ (m tiles)·(n/128 lanes)·
(ceil(k/128) passes); k=64 rounds up to one pass, so an hd=64 matmul
costs the SAME time as the hd=128 one with twice the FLOPs — the
"half-fill" is intrinsic to the shape, not to the kernel's layout.

This script measures the dots INSIDE a Pallas kernel on VMEM-resident
tiles (an XLA-level einsum bench is dispatch/HBM noise at these sizes —
a first attempt measured 0.4 "TF/s" and taught nothing), repeating each
dot R times per grid step so the MXU issue rate is what's timed.

Run: python scripts/exp_hd64_pack.py

MEASURED (v5e bf16, r04), per head sweep (all heads once; absolute
times include a constant per-sweep accumulator-update overhead that is
identical across variants, so the DELTAS carry the signal):

  WavLM shape (H16 bq512 Tk512):
    QK^T hd=64 158.1 us | hd=128 =FLOPs 202.9 | blockdiag-pack 143.9
    PV   hd=64 124.1 us | hd=128 =FLOPs 164.7 | blockdiag-pack 165.2
  Whisper shape (H20 bq256 Tk1536):
    QK^T hd=64 206.8 us | hd=128 =FLOPs 189.0 | blockdiag-pack 162.5
    PV   hd=64 179.8 us | hd=128 =FLOPs 157.8 | blockdiag-pack 157.7

CONCLUSION — CLOSED, the premise was wrong: if hd=64 dots ran at half
the MXU rate, the equal-FLOP hd=128 variants would be ~2x faster; they
are at most 1.14x faster and at the WavLM shape they are SLOWER. The
v5e MXU streams the contraction dimension per-cycle (pipeline fill is
amortized over output columns) rather than rounding k up to 128, so
hd=64 carries no intrinsic 2x "half-fill" penalty to reclaim — and the
packing variants, which the algebra above already showed cannot create
work savings, measure within +-15% with inconsistent sign. The
remaining stack-anatomy gap (GEMM skeleton 153 vs 197 TF/s peak,
exp_gemm_roofline.py) is the XLA/Mosaic ceiling at these matmul sizes,
not head-dim lane fill. No kernel change ships from this experiment.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

dt = jnp.bfloat16
R = 256  # grid repeats (amortizes dispatch; operands stay VMEM-resident)


def _dots_kernel(a_ref, b_ref, o_ref, acc, *, n_heads, hd, mode):
    """One per-head dot sweep on VMEM-resident operands; grid repeats it.

    The grid's R steps all index the same blocks (constant index map), so
    Pallas fetches operands once and the steps time pure MXU issue."""
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    for h in range(n_heads):
        lo, hi = h * hd, (h + 1) * hd
        if mode == "qkt":  # [m, hd] x [n, hd]^T -> [m, n]
            s = jax.lax.dot_general(
                a_ref[0][:, lo:hi], b_ref[0][:, lo:hi],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            acc[:, : s.shape[1]] += s * (1.0 / R)
        else:  # 'pv': [m, Tk] x [Tk, hd] -> [m, hd]
            s = jax.lax.dot_general(
                a_ref[0], b_ref[0][:, lo:hi],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            acc[:, lo:hi] += s * (1.0 / R)

    @pl.when(r == R - 1)
    def _fin():
        o_ref[0] = acc[...].astype(o_ref.dtype)


def bench_dots(label, a, b, out_shape, n_heads, hd, mode, flops):
    a, b = a[None], b[None]
    kern = functools.partial(_dots_kernel, n_heads=n_heads, hd=hd, mode=mode)
    fn = pl.pallas_call(
        kern,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1,) + a.shape[1:], lambda r: (0, 0, 0)),
            pl.BlockSpec((1,) + b.shape[1:], lambda r: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1,) + out_shape, lambda r: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1,) + out_shape, dt),
        scratch_shapes=[pltpu.VMEM(out_shape, jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20),
    )
    fn = jax.jit(fn)
    out = fn(a, b)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(a, b).astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    t = best / R
    print(f"  {label:36s}: {t*1e6:8.1f} us/sweep  ({flops/t/1e12:6.1f} TF/s)")
    return t


def run_shape(H, bq, Tk, hd=64):
    print(f"shape H={H} bq={bq} Tk={Tk} hd={hd} (per-sweep = all heads once):")
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32)).astype(dt)
    D = H * hd
    fl = 2 * H * bq * Tk * hd  # one full head sweep

    # QK^T: q [bq, D], k [Tk, D], per-head contraction over hd
    bench_dots(f"QK^T hd={hd} ({H} heads)", mk(bq, D), mk(Tk, D),
               (bq, Tk), H, hd, "qkt", fl)
    # same FLOPs at hd=128: H/2 heads of 128
    bench_dots(f"QK^T hd={2*hd} ({H//2} heads, =FLOPs)", mk(bq, D), mk(Tk, D),
               (bq, Tk), H // 2, 2 * hd, "qkt", fl)
    # block-diag pack: q pairs lane-concatenated [bq, 128] x k-blockdiag
    # [128, 2Tk] — emulated as H/2 heads of hd=128 against 2Tk outputs
    bench_dots(f"QK^T hd={hd} blockdiag-packed", mk(bq, D), mk(2 * Tk, D),
               (bq, 2 * Tk), H // 2, 2 * hd, "qkt", fl)

    # PV: p [bq, Tk] shared per head here (timing-equivalent), v [Tk, D]
    bench_dots(f"PV   hd={hd} ({H} heads)", mk(bq, Tk), mk(Tk, D),
               (bq, D), H, hd, "pv", fl)
    bench_dots(f"PV   hd={2*hd} ({H//2} heads, =FLOPs)", mk(bq, Tk), mk(Tk, D),
               (bq, D), H // 2, 2 * hd, "pv", fl)
    # block-diag PV: [bq, 2Tk] x [2Tk, 128] per pair = H/2 sweeps
    bench_dots(f"PV   hd={hd} blockdiag-packed", mk(bq, 2 * Tk), mk(2 * Tk, D),
               (bq, D), H // 2, 2 * hd, "pv", fl)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    run_shape(H=16, bq=512, Tk=512)   # WavLM-large / HuBERT regime
    run_shape(H=20, bq=256, Tk=1536)  # whisper regime
