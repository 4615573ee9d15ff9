#!/usr/bin/env python
"""Conv-frontend inter-layer LayerNorm dtype experiment (v5e).

b276f44's decomposition found the frontend drag is conv0 + the f32
LN→bf16 casts BETWEEN conv layers: with dtype=f32 LNs, the [B, T_i, 512]
activations round-trip HBM in f32 (layer-0 output alone is
B·49999·512·4 ≈ 3.3 GB/pass at B=32) even though the convs run bf16.

Variant under test: LN statistics in f32 (numerics preserved — mean/var
are flax force_float32_reductions), elementwise normalize + affine in
bf16, so every big tensor XLA materializes between convs is 2 bytes wide.

MEASURED RESULT (v5e, 2026-08): NEGATIVE — dead even. Frontend 23.63 ms
(f32-LN) vs 23.52 ms (bf16-LN); e2e WavLM-large forward 111.63 ms /
286.7 utt/s vs 111.71 ms / 286.5 utt/s at B=32. Cosine 1.00000000. XLA
already fuses the f32 normalize into the conv epilogue, so the f32
round-trip this experiment targeted never hits HBM as a separate pass.
models/speech.py keeps the f32 LNs (wider numerics for free); this
script keeps the A/B runnable via a local monkeypatch of the LN dtype.

Timing note: under the tunneled TPU ``block_until_ready`` can return
early (see .claude/skills/verify) — every measurement chains n_chain
applies inside jit with the output fed back into the next input (so XLA
cannot hoist the loop-invariant forward) and forces a scalar readback.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from flax import linen as nn

from interspeech_ser_tpu.models.speech import (
    ConvFeatureExtractor, SpeechEncoderModel, wavlm_large,
)

_REAL_LN = nn.LayerNorm
_LN_MODE = {"mode": "f32"}


def _patched_ln(*args, **kw):
    # narrow ONLY the conv-frontend inter-layer LNs (named conv_ln{i});
    # encoder-stack LNs keep their production dtype
    if _LN_MODE["mode"] == "bf16" and str(kw.get("name", "")).startswith("conv_ln"):
        kw = dict(kw, dtype=jnp.bfloat16)
    return _REAL_LN(*args, **kw)


def set_ln_mode(mode):
    _LN_MODE["mode"] = mode
    nn.LayerNorm = _patched_ln if mode == "bf16" else _REAL_LN


B, L = 32, 160000
N_CHAIN = 6
rng = np.random.default_rng(0)
wav = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32) * 0.1)
mask = jnp.ones((B, L), jnp.float32)


def timeit(fn, *args, n=5):
    """fn must return a scalar; times n_chain-amortized best-of."""
    float(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


results = {}
for ln_mode in ("f32", "bf16"):
    set_ln_mode(ln_mode)
    cfg = wavlm_large(dtype="bfloat16")
    fe = ConvFeatureExtractor(cfg)
    params = fe.init(jax.random.PRNGKey(0), wav[:1])["params"]

    @jax.jit
    def chained_fe(p, w):
        # the tiny delta feeds the loop output back into the next input so
        # XLA cannot hoist the loop-invariant forward out of the fori_loop
        def body(i, w):
            out = fe.apply({"params": p}, w)
            return w + (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(w.dtype)
        return jnp.sum(jax.lax.fori_loop(0, N_CHAIN, body, w))

    t = timeit(chained_fe, params, wav) / N_CHAIN
    print(f"frontend LN={ln_mode}: {t*1e3:.2f} ms", flush=True)

    out = np.asarray(
        jax.jit(lambda p, w: fe.apply({"params": p}, w))(params, wav),
        np.float64,
    ).ravel()
    results[ln_mode] = out

cos = results["f32"] @ results["bf16"] / (
    np.linalg.norm(results["f32"]) * np.linalg.norm(results["bf16"]) + 1e-12
)
print(f"frontend cosine bf16-LN vs f32-LN: {cos:.8f}", flush=True)

# end-to-end WavLM-large extraction forward
for ln_mode in ("f32", "bf16"):
    set_ln_mode(ln_mode)
    cfg = wavlm_large(dtype="bfloat16")
    model = SpeechEncoderModel(cfg)
    params = model.init(jax.random.PRNGKey(0), wav[:1], mask[:1])["params"]
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    @jax.jit
    def chained(p, w, m):
        def body(i, w):
            out = model.apply({"params": p}, w, m)["last_hidden_state"]
            return w + (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(w.dtype)
        return jnp.sum(jax.lax.fori_loop(0, N_CHAIN, body, w))

    t = timeit(chained, params, wav, mask) / N_CHAIN
    print(
        f"e2e wavlm LN={ln_mode}: {t*1e3:7.2f} ms  ({B/t:6.1f} utt/s)",
        flush=True,
    )
