#!/usr/bin/env python
"""WavLM-large extraction throughput vs batch size (v5e, bf16).

The pipeline's default token budget (320 s of audio per batch → B=32 at
10-s utterances) was set when B=32 measured +4% over B=16. Extraction is
forward-only — activations are freed layer-to-layer — so far larger
batches fit HBM; this sweeps B to find where the conv frontend + stack
tiling actually saturates.

Chained-dependency timing (one dispatch, N dependent forwards) — the
tunneled runtime's per-call timing can't be trusted.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from interspeech_ser_tpu.models.speech import (
    SpeechEncoderModel,
    default_fused_frontend,
    wavlm_large,
)

T = 160000  # 10-s utterances


def measure(batch: int, n_chain: int = 8) -> float:
    # sweep the PRODUCTION-winning path: oneshot2 attention kernel +
    # measured fused-frontend depth (bench.py best variant), not plain XLA
    cfg = dataclasses.replace(
        wavlm_large(dtype="bfloat16"), inference_kernels=True
    )
    model = SpeechEncoderModel(cfg, fused_frontend=default_fused_frontend(cfg))
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(batch, T)).astype(np.float32))
    mask = jnp.ones((batch, T), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), wav[:1], mask[:1])["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    def fwd(params, wav, mask):
        return model.apply({"params": params}, wav, mask)["last_hidden_state"]

    @jax.jit
    def chained(params, wav, mask):
        def body(i, w):
            out = fwd(params, w, mask)
            delta = jnp.sum(out.astype(jnp.float32), axis=(1, 2)) * 1e-12
            return w + delta[:, None]
        return jax.lax.fori_loop(0, n_chain, body, wav)

    out = chained(params, wav, mask)
    float(out[0, 0])
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        out = chained(params, wav, mask)
        float(out[0, 0])
        best = max(best, batch * n_chain / (time.perf_counter() - t0))
    return best


if __name__ == "__main__":
    for b in (24, 32, 40, 48, 64):
        try:
            r = measure(b)
            print(f"B={b:3d}: {r:7.1f} utt/s", flush=True)
        except Exception as e:  # noqa: BLE001 — OOM at some B is the finding
            print(f"B={b:3d}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
            break
