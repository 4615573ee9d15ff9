#!/usr/bin/env python
"""Raw-GEMM roofline at the WavLM-large stack's exact shapes.

exp_stack_anatomy.py measured the pure-GEMM skeleton of the 24-layer
stack at ~153 TF/s vs a ~197 TF/s bf16 FLOP speed-of-light. This script
asks whether that 22% gap is XLA inter-op overhead (reclaimable by
fusing) or simply what isolated bf16 GEMMs achieve at these shapes.

Method: chain GEMM *pairs* (up-projection then down-projection) inside
one jit — the second GEMM consumes the first's output, so the chain is
serial with ZERO glue (a first attempt folded a scalar back into x each
iteration; the full-tensor sum + update passes dominated the small GEMMs
and produced garbage per-GEMM rates).

MEASURED (v5e, bf16, 2026-08-20):
  [19168,1024]x[1024,4096] mlp pair   154.2 TF/s   <- the stack shape
  [19168,1024]x[1024,1024] proj pair   94.7 TF/s   <- N=1024 is intrinsically slow
  [ 8192,4096]x[4096,4096] square      166.7 TF/s
  [16384,4096]x[4096,4096] square      178.3 TF/s

CONCLUSION: 154 TF/s IS the XLA GEMM ceiling at the stack's MLP shape —
the skeleton's 153 leaves nothing on the table, and even giant square
GEMMs only reach 178 on this chip. The 24-layer stack's blended 127 TF/s
is ~82% of the achievable-GEMM ceiling, with the remainder already
attributed (softmax exp ~0.25 ms/layer, hd=64 SDPA half-fill). Widening
the N=1024 projections via qkv fusion was separately measured NEGATIVE
end-to-end (scripts/exp_qkv_fused.py: 0.92x — HBM locality loss beats
the wider-GEMM gain). Single-chip WavLM extraction is at its practical
floor; further stack-GEMM work is a dead end.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

SHAPES = [
    # (M, K, N)   B=32, T'=599 -> M=19168
    (19168, 1024, 4096),
    (19168, 1024, 1024),
    (8192, 4096, 4096),
    (16384, 4096, 4096),
]


def pair(M, K, N, n_chain=60):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray((rng.normal(size=(K, N)) / np.sqrt(K)).astype(np.float32), jnp.bfloat16)
    wb = jnp.asarray((rng.normal(size=(N, K)) / np.sqrt(N)).astype(np.float32), jnp.bfloat16)

    @jax.jit
    def chained(x, w, wb):
        def body(i, x):
            y = x @ w        # [M, N]
            return y @ wb    # [M, K] — two GEMMs per iteration, no glue
        return jax.lax.fori_loop(0, n_chain, body, x)

    out = chained(x, w, wb)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chained(x, w, wb)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    per = best / n_chain
    flops = 2 * M * K * N * 2  # two GEMMs
    print(
        f"[{M},{K}]x[{K},{N}] pair: {per*1e3:7.3f} ms/iter  "
        f"{flops/per/1e12:6.1f} TF/s", flush=True,
    )


if __name__ == "__main__":
    for M, K, N in SHAPES:
        pair(M, K, N)
