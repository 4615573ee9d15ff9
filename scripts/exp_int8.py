#!/usr/bin/env python
"""int8 extraction mode: throughput + quality vs bf16/f32."""
import sys, os, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from interspeech_ser_tpu.models.speech import (
    SpeechEncoderModel, quantize_params_int8, wavlm_large,
)

B, T = int(os.environ.get("B", 32)), 160000
rng = np.random.default_rng(0)
wav = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32) * 0.1)
mask = jnp.ones((B, T), jnp.float32)

cfg_f32 = wavlm_large(dtype="float32")
model_f32 = SpeechEncoderModel(cfg_f32)
params = model_f32.init(jax.random.PRNGKey(0), wav[:1], mask[:1])["params"]

out_f32 = model_f32.apply({"params": params}, wav[:2], mask[:2])["last_hidden_state"]

cfg_i8 = wavlm_large(dtype="int8")
model_i8 = SpeechEncoderModel(cfg_i8)
params_i8 = quantize_params_int8(jax.tree.map(np.asarray, params))
params_i8 = jax.tree.map(jnp.asarray, params_i8)
out_i8 = model_i8.apply({"params": params_i8}, wav[:2], mask[:2])["last_hidden_state"]

a = np.asarray(out_f32, np.float64).ravel()
b = np.asarray(out_i8, np.float64).ravel()
cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
print(f"int8-vs-f32 cosine: {cos:.6f}  max_abs: {np.abs(a-b).max():.4f} (scale {np.abs(a).max():.3f})")

cfg_bf = wavlm_large(dtype="bfloat16")
model_bf = SpeechEncoderModel(cfg_bf)
params_bf = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
out_bf = model_bf.apply({"params": params_bf}, wav[:2], mask[:2])["last_hidden_state"]
c = np.asarray(out_bf, np.float64).ravel()
cos_bf = a @ c / (np.linalg.norm(a) * np.linalg.norm(c))
print(f"bf16-vs-f32 cosine: {cos_bf:.6f}")


def chain_time(model, p, n_chain=10):
    @jax.jit
    def chained(params, wav, mask):
        def body(i, w):
            out = model.apply({"params": params}, w, mask)["last_hidden_state"]
            delta = jnp.sum(out.astype(jnp.float32), axis=(1, 2)) * 1e-12
            return w + delta[:, None]
        return jax.lax.fori_loop(0, n_chain, body, wav)
    out = chained(p, wav, mask); float(out[0, 0])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); out = chained(p, wav, mask); float(out[0, 0])
        best = min(best, time.perf_counter() - t0)
    return B * n_chain / best

u_bf = chain_time(model_bf, params_bf)
u_i8 = chain_time(model_i8, params_i8)
print(f"bf16: {u_bf:.1f} utt/s   int8: {u_i8:.1f} utt/s  ({u_i8/u_bf:.2f}x)")
