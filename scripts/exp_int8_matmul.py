#!/usr/bin/env python
"""Decisive int8 probe: raw MXU int8×int8→int32 vs bf16 matmul on v5e.

The int8 extraction mode (models/speech.py QDense) lost at WavLM
extraction shapes (commit e93bf11). Before auditing quality everywhere,
check the premise: does an int8 dot_general actually run ~2× bf16 peak
here? If this isolated probe can't clear ~1.5× at a fat weight-stationary
shape (DeBERTa-xxl FFN: [2560, 1536] @ [1536, 6144]), no end-to-end mode
built on it can win, and VERDICT r02 says to remove the mode.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

M, K, N = 2560, 1536, 6144
rng = np.random.default_rng(0)
a8 = jnp.asarray(rng.integers(-127, 128, size=(M, K)), jnp.int8)
b8 = jnp.asarray(rng.integers(-127, 128, size=(K, N)), jnp.int8)
abf = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
bbf = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)


def bench(fn, *args, n=50):
    @jax.jit
    def many(*args):
        def body(i, acc):
            out = fn(*args)
            return acc + out[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(many(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(many(*args))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def mm_i8(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def mm_bf(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


flops = 2 * M * K * N
t_bf = bench(mm_bf, abf, bbf)
t_i8 = bench(mm_i8, a8, b8)
print(f"bf16: {t_bf*1e6:8.1f} us  ({flops/t_bf/1e12:6.1f} TF/s)")
print(f"int8: {t_i8*1e6:8.1f} us  ({flops/t_i8/1e12:6.1f} TOP/s)  "
      f"speedup {t_bf/t_i8:.2f}x")

# with the dynamic per-row activation quant QDense actually performs
def mm_i8_dynq(x, b, scale):
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return y.astype(jnp.float32) * (s_x * scale)


scale = jnp.ones((N,), jnp.float32)
t_dq = bench(mm_i8_dynq, abf, b8, scale)
print(f"int8+dynquant(from bf16 acts): {t_dq*1e6:8.1f} us  "
      f"speedup vs bf16 {t_bf/t_dq:.2f}x")
