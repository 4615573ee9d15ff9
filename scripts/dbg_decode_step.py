#!/usr/bin/env python
"""Isolate the per-token decode step cost."""
import sys, os, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from interspeech_ser_tpu.models.whisper_decoder import (
    WhisperDecoderConfig, WhisperDecoderModel,
)

B, S, TOTAL = 4, 1500, 67
cfg = WhisperDecoderConfig(dtype="bfloat16")
D, H, L = cfg.d_model, cfg.decoder_attention_heads, cfg.decoder_layers
hd = D // H
dt = cfg.compute_dtype
rng = np.random.default_rng(0)

key = jax.random.PRNGKey(0)
def lin(i, o, bias=True):
    d = {"kernel": jax.random.normal(key, (i, o), jnp.float32) * 0.02}
    if bias:
        d["bias"] = jnp.zeros(o, jnp.float32)
    return d

params = {}
for i in range(L):
    lp = {}
    for attn in ("self_attn", "encoder_attn"):
        lp[attn] = {"q_proj": lin(D, D), "k_proj": lin(D, D, False),
                    "v_proj": lin(D, D), "out_proj": lin(D, D)}
        lp[f"{attn}_layer_norm"] = {"scale": np.ones(D, np.float32), "bias": np.zeros(D, np.float32)}
    lp["final_layer_norm"] = {"scale": np.ones(D, np.float32), "bias": np.zeros(D, np.float32)}
    lp["fc1"] = lin(D, cfg.decoder_ffn_dim)
    lp["fc2"] = lin(cfg.decoder_ffn_dim, D)
    params[f"layer{i}"] = lp
embed = jax.random.normal(key, (cfg.vocab_size, D), jnp.float32) * 0.02
cross_k = (jax.random.normal(key, (L, B, H, S, hd), jnp.float32)).astype(dt)
cross_v = (jax.random.normal(key, (L, B, H, S, hd), jnp.float32)).astype(dt)
k_cache = jnp.zeros((L, B, H, TOTAL, hd), dt)
v_cache = jnp.zeros((L, B, H, TOTAL, hd), dt)
x0 = jax.random.normal(key, (B, 1, D), jnp.float32).astype(dt)
pos_ids = jnp.arange(TOTAL)


def timeit(name, fn, *args, donate=()):
    f = jax.jit(fn, donate_argnums=donate)
    out = f(*args)
    jax.block_until_ready(out)
    # chained x10 not easy for multi-out; just run 20x wall clock
    t0 = time.perf_counter()
    for _ in range(20):
        out = f(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    dtms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{name}: {dtms:.2f} ms")
    return out


def _linear(p, x):
    out = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


# 1. 32-layer matmul-only chain (no caches, no cross)
def mats_only(x):
    for i in range(L):
        lp = params[f"layer{i}"]
        a = lp["self_attn"]
        q = _linear(a["q_proj"], x)
        x = x + _linear(a["out_proj"], q)
        h = jax.nn.gelu(_linear(lp["fc1"], x), approximate=False)
        x = x + _linear(lp["fc2"], h.astype(dt))
    return x

timeit("32-layer matmuls only", mats_only, x0)

# 2. cross-attention reads only
def cross_only(x):
    for i in range(L):
        q = x.reshape(B, H, hd)
        s = jnp.einsum("bhd,bhkd->bhk", q, cross_k[i], preferred_element_type=jnp.float32)
        w = jax.nn.softmax(s, -1).astype(dt)
        o = jnp.einsum("bhk,bhkd->bhd", w, cross_v[i], preferred_element_type=jnp.float32)
        x = x + o.reshape(B, 1, D).astype(dt)
    return x

timeit("32x cross-attn reads", cross_only, x0)

# 3. cache updates only
def cache_update(k_cache, v_cache, x, idx):
    for i in range(L):
        k_new = x.reshape(B, H, 1, hd)[None]
        k_cache = jax.lax.dynamic_update_slice(k_cache, k_new.astype(dt), (i, 0, 0, idx, 0))
        v_cache = jax.lax.dynamic_update_slice(v_cache, k_new.astype(dt), (i, 0, 0, idx, 0))
    return k_cache, v_cache

timeit("32x2 cache updates (donated)", cache_update, k_cache, v_cache, x0, jnp.int32(5), donate=(0, 1))

# 4. self-attn reads over cache
def self_reads(x, k_cache, v_cache, idx):
    for i in range(L):
        q = x.reshape(B, H, hd)
        s = jnp.einsum("bhd,bhkd->bhk", q, k_cache[i], preferred_element_type=jnp.float32)
        s = jnp.where(pos_ids[None, None, :] <= idx, s, -1e30)
        w = jax.nn.softmax(s, -1).astype(dt)
        o = jnp.einsum("bhk,bhkd->bhd", w, v_cache[i], preferred_element_type=jnp.float32)
        x = x + o.reshape(B, 1, D).astype(dt)
    return x

timeit("32x self-attn cache reads", self_reads, x0, k_cache, v_cache, jnp.int32(5))

# 5. LM head
def lm_head(x):
    return x[:, 0].astype(jnp.float32) @ embed.T

timeit("LM head (f32 265MB read)", lm_head, x0)
