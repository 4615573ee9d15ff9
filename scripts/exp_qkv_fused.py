#!/usr/bin/env python
"""A/B the fused [D,3D] qkv projection on v5e (WavLM-large, bf16, e2e).

Motivation: the split q/k/v projections read the layer input from HBM
three times per layer (B=32, T'=499, D=1024 bf16 ≈ 33 MB → ~66 MB of
avoidable reads × 24 layers ≈ 1.6 GB/forward, ~2 ms at v5e HBM bw) and
dispatch three M=15968 K=N=1024 matmuls where one K=1024 N=3072 would do.
Expected small (~1-2% e2e) — measured either way, adopted only on a win.
Covers the speech stack only (text encoders carry their own projections).

Run: python scripts/exp_qkv_fused.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from interspeech_ser_tpu.models.speech import (
    SpeechEncoderModel,
    default_fused_frontend,
    fuse_qkv_params,
    wavlm_large,
)

B = int(os.environ.get("EXP_B", 32))
T = int(os.environ.get("EXP_T", 160000))
N_CHAIN = int(os.environ.get("EXP_CHAIN", 8))

base_cfg = dataclasses.replace(wavlm_large(dtype="bfloat16"), inference_kernels=True)
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


ff = default_fused_frontend(base_cfg)
split_model = SpeechEncoderModel(base_cfg, fused_frontend=ff)
params = split_model.init(jax.random.PRNGKey(0), wav[:1], mask[:1])["params"]
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

fused_cfg = dataclasses.replace(base_cfg, fused_qkv=True)
fused_model = SpeechEncoderModel(fused_cfg, fused_frontend=ff)
fused_params = fuse_qkv_params(params)

# numeric parity first (a fast-but-wrong layout must not be adopted)
a = np.asarray(
    split_model.apply({"params": params}, wav[:2, :32000], mask[:2, :32000])[
        "last_hidden_state"
    ],
    np.float64,
).ravel()
b = np.asarray(
    fused_model.apply({"params": fused_params}, wav[:2, :32000], mask[:2, :32000])[
        "last_hidden_state"
    ],
    np.float64,
).ravel()
cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
print(f"parity cosine (bf16): {cos:.6f}", flush=True)

for label, model, p in (
    ("split-qkv", split_model, params),
    ("fused-qkv", fused_model, fused_params),
):
    def fwd(w, m, model=model, p=p):
        return model.apply({"params": p}, w, m)["last_hidden_state"]

    t = timed(fwd, wav, mask)
    print(f"e2e wavlm {label}: {t*1e3:7.2f} ms  {B/t:7.1f} utt/s", flush=True)


# ---- whisper-large-v3 encoder (T=1500 → larger avoidable HBM reads) ----
from interspeech_ser_tpu.models.whisper import (  # noqa: E402
    WhisperEncoderModel,
    fuse_qkv_params_whisper,
    whisper_large_v3,
)

WB = int(os.environ.get("EXP_WHISPER_B", 8))
WT = int(os.environ.get("EXP_WHISPER_TMEL", 3000))
wcfg = dataclasses.replace(whisper_large_v3(dtype="bfloat16"), inference_kernels=True)
wmodel = WhisperEncoderModel(wcfg)
mel = jnp.asarray(rng.normal(size=(WB, wcfg.num_mel_bins, WT)).astype(np.float32))
wparams = wmodel.init(jax.random.PRNGKey(0), mel[:1])["params"]
wparams = jax.tree.map(lambda x: x.astype(jnp.bfloat16), wparams)
wf_cfg = dataclasses.replace(wcfg, fused_qkv=True)
wf_model = WhisperEncoderModel(wf_cfg)
wf_params = fuse_qkv_params_whisper(wparams)

a = np.asarray(
    wmodel.apply({"params": wparams}, mel[:1])["last_hidden_state"], np.float64
).ravel()
b = np.asarray(
    wf_model.apply({"params": wf_params}, mel[:1])["last_hidden_state"], np.float64
).ravel()
cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
print(f"whisper parity cosine (bf16): {cos:.6f}", flush=True)

for label, model, p in (
    ("split-qkv", wmodel, wparams),
    ("fused-qkv", wf_model, wf_params),
):
    def fwd(m_in, model=model, p=p):
        return model.apply({"params": p}, m_in)["last_hidden_state"]

    @jax.jit
    def chained(m_in, fwd=fwd):
        def body(i, m_):
            out = fwd(m_)
            return m_ + (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(m_.dtype)
        return jnp.sum(jax.lax.fori_loop(0, N_CHAIN, body, m_in))

    float(chained(mel))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(mel))
        best = min(best, (time.perf_counter() - t0) / N_CHAIN)
    print(
        f"e2e whisper {label}: {best*1e3:7.2f} ms  {WB/best:7.1f} windows/s",
        flush=True,
    )
