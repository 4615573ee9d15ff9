#!/usr/bin/env python
"""Experiment: pos_conv with fewer effective groups (block-diag embedding),
im2col matmul per group, and split-tap formulations."""
import sys, os, time
import numpy as np
import jax, jax.numpy as jnp
from flax import linen as nn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

B, T, D, G, K = 16, 499, 1024, 16, 128
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
kf = (rng.normal(size=(K, 64, D)) * 0.01).astype(np.float32)  # [k, in/group, out]
bias = jnp.zeros((D,), dt)
gflop = 2 * B * T * D * (K * D // G) / 1e9

# baseline: native grouped conv
kern16 = jnp.asarray(kf).astype(dt)
def pc_native(x, kern):
    y = jax.lax.conv_general_dilated(
        x, kern, (1,), [(64, 64)], dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=G, preferred_element_type=dt) + bias
    return nn.gelu(y[:, :-1, :], approximate=True)
print(f"native g16: {chain_time(pc_native, h, kern16)*1e3:.3f} ms  ({gflop:.0f} GF)")

# block-diag embeddings at G_eff in {8, 4, 2}
for geff in (8, 4, 2):
    m = G // geff       # how many real groups merge into one eff group
    cin_eff = 64 * m
    kd = np.zeros((K, cin_eff, D), np.float32)
    for g in range(G):
        eg, idx = g // m, g % m
        kd[:, idx * 64 : (idx + 1) * 64, g * 64 : (g + 1) * 64] = kf[:, :, g * 64 : (g + 1) * 64]
    kde = jnp.asarray(kd).astype(dt)
    def pc_blockdiag(x, kern, geff=geff):
        y = jax.lax.conv_general_dilated(
            x, kern, (1,), [(64, 64)], dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=geff, preferred_element_type=dt) + bias
        return nn.gelu(y[:, :-1, :], approximate=True)
    t = chain_time(pc_blockdiag, h, kde)
    print(f"blockdiag g{geff}: {t*1e3:.3f} ms  ({gflop*m:.0f} GF eff, {gflop*m/t/1e3:.0f} TF/s)")

if os.environ.get("EXP_PART", "1") == "1":
    sys.exit(0)

# im2col matmul: patches [B,T,K*64] per group won't fit; do groups->batch then im2col
kg = jnp.asarray(np.stack([kf[:, :, g * 64 : (g + 1) * 64] for g in range(G)], 0)).astype(dt)  # [G,K,64,64]
def pc_im2col(x, kg):
    xp = jnp.pad(x.reshape(B, T, G, 64), ((0, 0), (64, 64), (0, 0), (0, 0)))
    xg = xp.transpose(2, 0, 1, 3)  # [G,B,T+128,64]
    Tp = T + 1
    sl = [xg[:, :, j : j + Tp, :] for j in range(K)]
    patches = jnp.concatenate(sl, axis=-1)  # [G,B,Tp,K*64]
    y = jnp.einsum("gbtc,gco->btgo", patches, kg.reshape(G, K * 64, 64),
                   preferred_element_type=dt)
    y = y.reshape(B, Tp, D)[:, :-1, :] + bias
    return nn.gelu(y, approximate=True)
t = chain_time(pc_im2col, h, kg)
print(f"im2col einsum: {t*1e3:.3f} ms ({gflop/t/1e3:.0f} TF/s)")

# split taps: y = sum_{p<P} conv(x shifted, k_p) with K/P taps each... same flops
# tap-sum of 1x1 grouped matmuls via dot_general batched over G: scan over taps in chunks
def pc_tapsum(x, kg):
    xp = jnp.pad(x.reshape(B, T, G, 64), ((0, 0), (64, 64), (0, 0), (0, 0)))
    Tp = T + 1
    def body(carry, d):
        acc = carry
        xs = jax.lax.dynamic_slice_in_dim(xp, d, Tp, axis=1)  # [B,Tp,G,64]
        y = jnp.einsum("btgi,gio->btgo", xs, kg[:, 0], preferred_element_type=dt)
        return acc + y, None
    # NOTE: uses kg[:,0] each tap — wrong math, timing shape only
    acc0 = jnp.zeros((B, Tp, G, 64), dt)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(K))
    y = acc.reshape(B, Tp, D)[:, :-1, :] + bias
    return nn.gelu(y, approximate=True)
t = chain_time(pc_tapsum, h, kg)
print(f"tap-scan einsum: {t*1e3:.3f} ms ({gflop/t/1e3:.0f} TF/s)")
