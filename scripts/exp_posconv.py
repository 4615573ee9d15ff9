#!/usr/bin/env python
"""Experiment: positional conv embedding cost + alternatives; flash SDPA check."""
import sys, os, time
import numpy as np
import jax, jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from interspeech_ser_tpu.models.speech import PositionalConvEmbedding, wavlm_large
from interspeech_ser_tpu.ops.attention_core import dot_product_attention

B, T, D = 16, 499, 1024
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


h = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)).astype(dt)
mod = PositionalConvEmbedding(cfg, name="pos_conv_embed")
params = mod.init(jax.random.PRNGKey(0), h[:1])["params"]
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
gflop = 2 * B * T * D * (128 * D // 16) / 1e9

t = chain_time(lambda x, p: mod.apply({"params": p}, x), h, params)
print(f"pos_conv grouped: {t*1e3:.3f} ms ({gflop/t/1e3:.0f} TF/s, {gflop:.0f} GF)")

# alternative: grouped conv as full dense conv with block-diagonal kernel
kernel = params["conv"]["kernel"]  # [128, 64, 1024]
G = 16
dense_k = np.zeros((128, D, D), np.float32)
kf = np.asarray(kernel, np.float32)
for g in range(G):
    dense_k[:, g * 64 : (g + 1) * 64, g * 64 : (g + 1) * 64] = kf[:, :, g * 64 : (g + 1) * 64]
dense_k = jnp.asarray(dense_k).astype(dt)
bias = params["conv"]["bias"].astype(dt)


def posconv_dense(x, dense_k, bias):
    y = jax.lax.conv_general_dilated(
        x, dense_k, (1,), [(64, 64)],
        dimension_numbers=("NWC", "WIO", "NWC"), preferred_element_type=dt,
    ) + bias
    y = y[:, :-1, :]
    return nn.gelu(y, approximate=True)


t2 = chain_time(posconv_dense, h, dense_k, bias)
print(f"pos_conv dense-blockdiag: {t2*1e3:.3f} ms ({16*gflop/t2/1e3:.0f} TF/s dense-equiv)")

# alternative: batched per-group conv via reshape to groups in batch dim
kg = jnp.asarray(kf.transpose(2, 0, 1).reshape(G, 64, 128, 64)).astype(dt)  # [G,out64? no]
# kernel [128, 64, 1024] = [k, in_per_group, out_total]; out g block uses in g block
kg = jnp.stack([kernel[:, :, g * 64 : (g + 1) * 64] for g in range(G)], 0).astype(dt)  # [G,128,64,64]


def posconv_grouped_batch(x, kg, bias):
    xg = x.reshape(B, T, G, 64).transpose(2, 0, 1, 3).reshape(G * B, T, 64)
    kgg = kg.reshape(G, 1, 128, 64, 64)
    # vmap conv over groups
    def one(xb, kk):
        return jax.lax.conv_general_dilated(
            xb, kk, (1,), [(64, 64)],
            dimension_numbers=("NWC", "WIO", "NWC"), preferred_element_type=dt)
    yg = jax.vmap(one)(xg.reshape(G, B, T, 64), kg)  # [G,B,T+1?,64]
    y = yg.transpose(1, 2, 0, 3).reshape(B, -1, D)[:, :-1, :] + bias
    return nn.gelu(y, approximate=True)


t3 = chain_time(posconv_grouped_batch, h, kg, bias)
print(f"pos_conv vmap-groups: {t3*1e3:.3f} ms")

# flash SDPA at exactly this shape
H, hd = 16, 64
q = jnp.asarray(rng.normal(size=(B, H, T, hd)).astype(np.float32)).astype(dt)
k_ = jnp.asarray(rng.normal(size=(B, H, T, hd)).astype(np.float32)).astype(dt)
v = jnp.asarray(rng.normal(size=(B, H, T, hd)).astype(np.float32)).astype(dt)
gate = jnp.asarray(rng.normal(size=(B, H, T)).astype(np.float32)).astype(dt)
pb = jnp.asarray(rng.normal(size=(H, T, T)).astype(np.float32)).astype(dt)
fmask = jnp.ones((B, T), jnp.float32)
sdpa_gf = 2 * 2 * B * H * T * T * hd / 1e9

for impl in ["xla", "flash"]:
    try:
        f = lambda q, k, v, g, pb: dot_product_attention(
            q, k, v, key_mask=fmask, gate=g, shared_bias=pb, force_impl=impl)
        t4 = chain_time(f, q, k_, v, gate, pb)
        f2 = lambda q, k, v: dot_product_attention(q, k, v, key_mask=fmask, force_impl=impl)
        t5 = chain_time(f2, q, k_, v)
        print(f"SDPA[{impl}] gated-bias: {t4*1e3:.3f} ms ({sdpa_gf/t4/1e3:.1f} TF/s)  plain: {t5*1e3:.3f} ms")
    except Exception as e:
        print(f"SDPA[{impl}] failed: {type(e).__name__}: {str(e)[:200]}")
