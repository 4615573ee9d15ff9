#!/usr/bin/env python
"""Measure KV-cached vs recompute greedy decode at Whisper-large shapes."""
import sys, os, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from interspeech_ser_tpu.models.whisper_decoder import (
    WhisperDecoderConfig, WhisperDecoderModel, greedy_decode, greedy_decode_cached,
)

B = int(os.environ.get("B", 4))
MAX_NEW = int(os.environ.get("MAX_NEW", 64))
S = 1500
cfg = WhisperDecoderConfig(dtype=os.environ.get("DT", "bfloat16"))
dec = WhisperDecoderModel(cfg)
rng = np.random.default_rng(0)
enc = jnp.asarray(rng.normal(size=(B, S, cfg.d_model)).astype(np.float32) * 0.1)
params = dec.init(
    jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32), enc[:1, :8]
)["params"]
prompt = np.asarray([50258, 50259, 50360], np.int64)

for name, fn in (("cached", greedy_decode_cached), ("recompute", greedy_decode)):
    t0 = time.perf_counter()
    toks = fn(dec, params, enc, prompt, 50257, MAX_NEW)
    np.asarray(toks)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    toks = fn(dec, params, enc, prompt, 50257, MAX_NEW)
    np.asarray(toks)
    run_s = time.perf_counter() - t0
    tps = B * MAX_NEW / run_s
    print(f"{name}: run {run_s:.2f}s ({tps:.1f} tok/s, compile {compile_s:.1f}s)")
