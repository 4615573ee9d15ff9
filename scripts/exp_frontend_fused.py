#!/usr/bin/env python
"""A/B the fused conv-frontend Pallas kernel on v5e (WavLM-large, bf16).

Sweeps fusion depth 0 (XLA) / 1 / 2 / 3 over (a) the frontend alone and
(b) the full end-to-end encoder forward at B=32, 10-s utterances —
chained-dispatch timing (the tunneled runtime defeats per-call timing).

Run: python scripts/exp_frontend_fused.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from interspeech_ser_tpu.models.speech import (
    ConvFeatureExtractor,
    SpeechEncoderModel,
    wavlm_large,
)

B, T = 32, 160000
N_CHAIN = 8
import dataclasses

# bench-comparable: oneshot2 attention enabled like bench.py/pipeline
cfg = dataclasses.replace(wavlm_large(dtype="bfloat16"), inference_kernels=True)
rng = np.random.default_rng(0)
wav = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))
mask = jnp.ones((B, T), jnp.float32)


def timed(apply_fn, *args):
    @jax.jit
    def chained(*a):
        def body(i, w):
            out = apply_fn(w, *a[1:])
            return w + (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(w.dtype)
        return jnp.sum(jax.lax.fori_loop(0, N_CHAIN, body, a[0]))

    float(chained(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, (time.perf_counter() - t0) / N_CHAIN)
    return best


import interspeech_ser_tpu.ops.pallas.conv_frontend as cfmod

_orig = cfmod.fused_conv_frontend


def _with_block(depth):
    # deeper fusion holds more per-tile intermediates in VMEM — shrink
    # the output tile with depth (rough budget: halve per extra layer)
    bf = {1: 2048, 2: 1024, 3: 512, 4: 256, 5: 256, 6: 128, 7: 128}[depth]

    def f(*a, **kw):
        kw.setdefault("block_f", bf)
        return _orig(*a, **kw)

    return f


fe_params = None
for depth in (0, 1, 2, 3, 5, 7):
    fe = ConvFeatureExtractor(cfg, fused_prefix=depth)
    if fe_params is None:
        fe_params = fe.init(jax.random.PRNGKey(0), wav[:1])["params"]
    cfmod.fused_conv_frontend = _with_block(depth) if depth else _orig
    try:
        t = timed(lambda w: fe.apply({"params": fe_params}, w), wav)
        print(f"frontend depth={depth}: {t*1e3:7.2f} ms", flush=True)
    except Exception as e:
        print(f"frontend depth={depth}: FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
cfmod.fused_conv_frontend = _orig

full_params = None
for depth in (0, 1, 2, 3):
    model = SpeechEncoderModel(cfg, fused_frontend=depth)
    if full_params is None:
        full_params = model.init(jax.random.PRNGKey(0), wav[:1], mask[:1])["params"]
        full_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), full_params)

    # params must be a jit ARGUMENT: closed-over they inline into the HLO
    # as ~600 MB of constants and the tunnel's compile endpoint rejects
    # the request body (HTTP 413)
    def fwd(w, m, p, model=model):
        return model.apply({"params": p}, w, m)["last_hidden_state"]

    cfmod.fused_conv_frontend = _with_block(depth) if depth else _orig
    try:
        t = timed(fwd, wav, mask, full_params)
        print(
            f"e2e depth={depth}: {t*1e3:7.2f} ms  {B/t:7.1f} utt/s", flush=True
        )
    except Exception as e:
        print(f"e2e depth={depth}: FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
cfmod.fused_conv_frontend = _orig
