#!/usr/bin/env python
"""Experiment: does padding the frame axis T=499 -> 512 speed up the stack?"""
import sys, os, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from interspeech_ser_tpu.models.speech import EncoderLayer, wavlm_large

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
cfg = wavlm_large(dtype="bfloat16")
D, H = cfg.hidden_size, cfg.num_heads
rng = np.random.default_rng(0)
dt = cfg.compute_dtype

layers = [
    EncoderLayer(cfg, has_relative_position_bias=(i == 0), name=f"layer{i}")
    for i in range(cfg.num_layers)
]


def stack(h, p, fmask):
    pb = None
    for i, lyr in enumerate(layers):
        h, pb = lyr.apply({"params": p[f"layer{i}"]}, h, fmask, pb)
    return h


def time_stack(T, T_valid):
    h0 = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32)).astype(dt)
    fmask = (jnp.arange(T)[None, :] < T_valid).astype(jnp.float32) * jnp.ones((B, 1))
    # init params at this T
    full_params = {}
    pb = None
    key = jax.random.PRNGKey(0)
    for i, lyr in enumerate(layers):
        vs = lyr.init(key, h0[:1], fmask[:1], pb)
        full_params[f"layer{i}"] = vs["params"]
        _, pb = lyr.apply(vs, h0[:1], fmask[:1], pb)
    full_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), full_params)

    n_chain = 10

    @jax.jit
    def chained(h, p, fmask):
        def body(i, h):
            y = stack(h, p, fmask)
            return h + (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(h.dtype)
        return jax.lax.fori_loop(0, n_chain, body, h)

    out = chained(h0, full_params, fmask)
    float(jnp.sum(out))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = chained(h0, full_params, fmask)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best / n_chain


for T, tv in [(499, 499), (512, 499), (640, 499)]:
    s = time_stack(T, tv)
    print(f"T={T} (valid {tv}): stack {s*1e3:.3f} ms  -> {B/ (s + 12.0e-3/16*B):.1f} utt/s-equiv")
