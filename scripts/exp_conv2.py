#!/usr/bin/env python
"""Experiment: tap-sum conv decomposition for the WavLM conv frontend.

Round-2 negative result (exp_conv.py): patch-CONCATENATION matmul loses to
XLA conv on layers 1-6 — the [B, Lout, k*C] patch tensor duplicates k/s x
the data and the relayout dominates.

This experiment tries the non-duplicating decompositions:

  tap-sum   out[t] = sum_j x[s*t + j] @ W_j   — k matmuls over strided
            phase views (reshape [B, t0, s, C] then slice phases), each
            contraction C=512, zero data duplication.
  reshape   for k == s (layers 5,6): out = x.reshape(B, t0, s*C) @ W —
            a single matmul, exact, no duplication at all.
  pair      for k=3,s=2: xr = x.reshape(B, t0, 2C);
            out = xr[:, :-1] @ [W0;W1] + xr[:, 1:] @ [W2;0] — two
            contraction-1024 matmuls, 1.33x FLOPs but no relayout.

Result (v5e, B=32, bf16, LN+gelu fused after, chained-dispatch timing):

  layer1 k=3 s=2 Lin=31999: conv 5.226 ms (154 TF/s)  tapsum 6.566  pair 8.539
  layer2 k=3 s=2 Lin=15999: conv 2.615 ms (154 TF/s)  tapsum 3.351  pair 4.351
  layer5 k=2 s=2 Lin= 1999: conv 0.337 ms (159 TF/s)  reshape 0.326 (164 TF/s)
  layer6 k=2 s=2 Lin=  999: conv 0.171 ms (157 TF/s)  reshape 0.168

NEGATIVE overall: standalone XLA conv already hits ~155 TF/s on layers
1-6 at B=32 (the 75 TF/s frontend number in profile_blocks.py is dragged
down by layer 0 + the f32 LayerNorm casts between layers, not the convs
themselves) and both decompositions lose to it — tap-sum on the phase
relayout, pair on the +33% FLOPs. The k==s reshape path is within noise
(~3%) of XLA conv; not worth a code path. Kept for the record.
"""
import sys, os, time
import numpy as np
import jax, jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from interspeech_ser_tpu.models.speech import wavlm_large

B = 32
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


L = 160000
lengths = [L]
for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
    lengths.append((lengths[-1] - k) // s + 1)
print("lengths:", lengths)

ln_scale = jnp.ones((512,), jnp.float32)
ln_bias = jnp.zeros((512,), jnp.float32)


def ln_gelu(y):
    m = y.astype(jnp.float32)
    mu = m.mean(-1, keepdims=True)
    var = m.var(-1, keepdims=True)
    y = ((m - mu) * jax.lax.rsqrt(var + 1e-5) * ln_scale + ln_bias).astype(dt)
    return nn.gelu(y, approximate=True)


for i in (1, 2, 5, 6):
    k, s, C = cfg.conv_kernel[i], cfg.conv_stride[i], 512
    Lin, Lout = lengths[i], lengths[i + 1]
    x = jnp.asarray(rng.normal(size=(B, Lin, C)).astype(np.float32)).astype(dt)
    kernel = jnp.asarray(rng.normal(size=(k, C, C)).astype(np.float32) * 0.01).astype(dt)
    bias = jnp.zeros((C,), dt)
    gflop = 2 * B * Lout * C * k * C / 1e9

    def conv_ref(x, kernel, bias):
        y = jax.lax.conv_general_dilated(
            x, kernel, (s,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=dt,
        ) + bias
        return ln_gelu(y)

    def tapsum(x, kernel, bias):
        t0 = Lin // s
        xr = x[:, : t0 * s, :].reshape(B, t0, s, C)
        xr = jnp.pad(xr, ((0, 0), (0, 1), (0, 0), (0, 0)))  # tail phase view
        acc = None
        for j in range(k):
            ph, off = j % s, j // s
            xp = xr[:, off : off + Lout, ph, :]
            y = xp @ kernel[j]
            acc = y if acc is None else acc + y
        return ln_gelu(acc + bias)

    rows = [("conv", conv_ref)]
    if k == s:
        def reshape_mm(x, kernel, bias):
            t0 = Lin // s
            xr = x[:, : t0 * s, :].reshape(B, t0, s * C)
            y = xr @ kernel.reshape(s * C, C) + bias
            return ln_gelu(y)
        rows.append(("reshape", reshape_mm))
    else:
        rows.append(("tapsum", tapsum))
        if k == 3 and s == 2:
            Wa = jnp.concatenate([kernel[0], kernel[1]], axis=0)  # [2C, C]
            Wb = jnp.concatenate([kernel[2], jnp.zeros_like(kernel[2])], axis=0)
            def pair(x, kernel, bias):
                t0 = Lin // s
                xr = x[:, : t0 * s, :].reshape(B, t0, s * C)
                xr = jnp.pad(xr, ((0, 0), (0, 1), (0, 0)))
                y = xr[:, : Lout, :] @ Wa + xr[:, 1 : Lout + 1, :] @ Wb
                return ln_gelu(y + bias)
            rows.append(("pair", pair))

    out = []
    for name, fn in rows:
        t = chain_time(fn, x, kernel, bias)
        out.append(f"{name} {t*1e3:.3f} ms ({gflop/t/1e3:.0f} TF/s)")
    print(f"layer{i} k={k} s={s} Lin={Lin}:", "  ".join(out))

# parity check tap-sum vs conv on layer1 shapes
k, s, C = 3, 2, 512
Lin = 513
Lout = (Lin - k) // s + 1
x = jnp.asarray(rng.normal(size=(2, Lin, C)).astype(np.float32))
kern = jnp.asarray(rng.normal(size=(k, C, C)).astype(np.float32) * 0.01)
ref = jax.lax.conv_general_dilated(x, kern, (s,), "VALID",
                                   dimension_numbers=("NWC", "WIO", "NWC"))
t0 = Lin // s
xr = x[:, : t0 * s, :].reshape(2, t0, s, C)
xr = jnp.pad(xr, ((0, 0), (0, 1), (0, 0), (0, 0)))
acc = sum(xr[:, j // s : j // s + Lout, j % s, :] @ kern[j] for j in range(k))
print("tapsum max err:", float(jnp.abs(ref - acc).max()))
