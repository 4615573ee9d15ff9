#!/usr/bin/env python
"""A/B the oneshot2 [B,T,D]-layout attention kernel vs XLA on v5e.

Isolated SDPA at the WavLM-large shape + end-to-end encoder forward.
Run: python scripts/exp_attn_btd.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from interspeech_ser_tpu.ops.attention_core import dot_product_attention_btd

B, H, T, hd = 32, 16, 499, 64
D = H * hd
rng = np.random.default_rng(0)
dt = jnp.bfloat16

q = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)).astype(dt)
k = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)).astype(dt)
v = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)).astype(dt)
gate = jnp.asarray(rng.uniform(0.5, 2.0, size=(B, H, T)).astype(np.float32))
bias = jnp.asarray(rng.normal(size=(H, T, T)).astype(np.float32)).astype(dt)
mask = jnp.ones((B, T), jnp.float32)


def bench(impl, n_chain=20):
    @jax.jit
    def chained(q, k, v, gate, bias, mask):
        def body(i, q):
            o = dot_product_attention_btd(
                q, k, v, H, key_mask=mask, gate=gate, shared_bias=bias,
                force_impl=impl,
            )
            return q + (jnp.sum(o.astype(jnp.float32)) * 1e-12).astype(q.dtype)
        return jax.lax.fori_loop(0, n_chain, body, q)

    out = chained(q, k, v, gate, bias, mask)
    out.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        chained(q, k, v, gate, bias, mask).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / n_chain


for impl in ("xla", "oneshot", "oneshot2"):
    t = bench(impl)
    flops = 2 * 2 * B * H * T * T * hd
    print(f"SDPA {impl:9s}: {t*1e3:7.3f} ms  ({flops/t/1e12:6.1f} TF/s)")

# numeric agreement on-device (bf16)
o_x = dot_product_attention_btd(q, k, v, H, key_mask=mask, gate=gate,
                                shared_bias=bias, force_impl="xla")
o_2 = dot_product_attention_btd(q, k, v, H, key_mask=mask, gate=gate,
                                shared_bias=bias, force_impl="oneshot2")
err = float(jnp.abs(o_x.astype(jnp.float32) - o_2.astype(jnp.float32)).max())
print(f"max |xla - oneshot2| (bf16): {err:.5f}")

# ---- end-to-end WavLM encoder forward ----
from interspeech_ser_tpu.models.speech import SpeechEncoderModel, wavlm_large

cfg = wavlm_large(dtype="bfloat16")
model = SpeechEncoderModel(cfg)
Twav = 160000
wav = jnp.asarray(rng.normal(size=(B, Twav)).astype(np.float32))
wmask = jnp.ones((B, Twav), jnp.float32)
params = model.init(jax.random.PRNGKey(0), wav[:1], wmask[:1])["params"]
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)


def e2e(impl):
    os.environ["SER_TPU_ATTN_IMPL"] = impl

    @jax.jit
    def step(p, w, m):
        return model.apply({"params": p}, w, m)

    out = step(params, wav, wmask)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(step(params, wav, wmask))
        best = min(best, time.perf_counter() - t0)
    del os.environ["SER_TPU_ATTN_IMPL"]
    return best


for impl in ("xla", "oneshot2"):
    t = e2e(impl)
    print(f"e2e wavlm {impl:9s}: {t*1e3:7.2f} ms  ({B/t:6.1f} utt/s)")
