#!/usr/bin/env python
"""Experiment: per-layer conv frontend timing + patch-matmul alternative."""
import sys, os, time
import numpy as np
import jax, jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from interspeech_ser_tpu.models.speech import wavlm_large

B = 16
cfg = wavlm_large(dtype="bfloat16")
dt = jnp.bfloat16
rng = np.random.default_rng(0)


def chain_time(fn, x, *rest, n_chain=10):
    @jax.jit
    def chained(x, *rest):
        def body(i, x):
            y = fn(x, *rest)
            return x + (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(x.dtype)
        return jax.lax.fori_loop(0, n_chain, body, x)
    out = chained(x, *rest)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = chained(x, *rest)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best / n_chain


# per-layer: XLA conv vs patch matmul, with LN+gelu fused after
L = 160000
lengths = [L]
for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
    lengths.append((lengths[-1] - k) // s + 1)
print("lengths:", lengths)

for i in range(1, 7):
    k, s, C = cfg.conv_kernel[i], cfg.conv_stride[i], 512
    Lin, Lout = lengths[i], lengths[i + 1]
    x = jnp.asarray(rng.normal(size=(B, Lin, C)).astype(np.float32)).astype(dt)
    kernel = jnp.asarray(rng.normal(size=(k, C, C)).astype(np.float32) * 0.01).astype(dt)
    bias = jnp.zeros((C,), dt)
    ln_scale = jnp.ones((C,), jnp.float32)
    ln_bias = jnp.zeros((C,), jnp.float32)
    gflop = 2 * B * Lout * C * k * C / 1e9

    def conv_ln_gelu(x, kernel, bias):
        y = jax.lax.conv_general_dilated(
            x, kernel, (s,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=dt,
        ) + bias
        m = y.astype(jnp.float32)
        mu = m.mean(-1, keepdims=True)
        var = m.var(-1, keepdims=True)
        y = ((m - mu) * jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias).astype(dt)
        return nn.gelu(y, approximate=True)

    def patch_ln_gelu(x, kernel, bias):
        sl = [x[:, j : j + (Lout - 1) * s + 1 : s, :] for j in range(k)]
        patches = jnp.concatenate(sl, axis=-1)  # [B, Lout, k*C]
        y = patches @ kernel.transpose(0, 1, 2).reshape(k * C, C) + bias
        m = y.astype(jnp.float32)
        mu = m.mean(-1, keepdims=True)
        var = m.var(-1, keepdims=True)
        y = ((m - mu) * jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias).astype(dt)
        return nn.gelu(y, approximate=True)

    t1 = chain_time(conv_ln_gelu, x, kernel, bias)
    t2 = chain_time(patch_ln_gelu, x, kernel, bias)
    print(f"layer{i} k={k} s={s} Lin={Lin}: conv {t1*1e3:.3f} ms ({gflop/t1/1e3:.0f} TF/s)  patch {t2*1e3:.3f} ms ({gflop/t2/1e3:.0f} TF/s)")
