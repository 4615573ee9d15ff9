#!/usr/bin/env python
"""Raw-GEMM roofline at the WavLM-large stack's exact shapes.

exp_stack_anatomy.py measured the pure-GEMM skeleton of the 24-layer
stack at ~153 TF/s vs a ~197 TF/s bf16 FLOP speed-of-light — this script
asks whether that 22% gap is XLA inter-op overhead (reclaimable by
fusing) or simply what isolated bf16 GEMMs achieve at these shapes
(M = B*T rows, K/N = 1024/4096): if the raw dots also land ~153 TF/s,
the stack GEMM gap is the hardware reality at these shapes and further
kernel work is pointless.

Chained-dependency timing (output folded into the input) — same method
as bench.py; per-shape TF/s printed.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

SHAPES = [
    # (M, K, N, label)   B=32, T'=599 -> M=19168
    (19168, 1024, 1024, "qkv/out proj"),
    (19168, 1024, 4096, "mlp up"),
    (19168, 4096, 1024, "mlp down"),
    (9584, 1024, 4096, "mlp up B16"),
    (8192, 1024, 4096, "mlp up M8k"),
]


def time_gemm(M, K, N, n_chain=40):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.02, jnp.bfloat16)
    # fold a scalar of the output back into x -> true serial chain
    wb = jnp.asarray(rng.normal(size=(N, K)).astype(np.float32) * 0.02, jnp.bfloat16)

    @jax.jit
    def chained(x, w, wb):
        def body(i, x):
            y = x @ w
            delta = jnp.sum(y.astype(jnp.float32)) * 1e-12
            return x + delta.astype(x.dtype)
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
    tfs = 2 * M * K * N / per / 1e12
    return per, tfs


if __name__ == "__main__":
    for M, K, N, label in SHAPES:
        per, tfs = time_gemm(M, K, N)
        print(f"[{M:6d},{K:5d}]x[{K:5d},{N:5d}] {label:14s}: "
              f"{per*1e3:7.3f} ms  {tfs:6.1f} TF/s", flush=True)
