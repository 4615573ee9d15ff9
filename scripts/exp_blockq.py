#!/usr/bin/env python
"""Bench-variant sweep: oneshot2 block_q {512,256,128} x batch {32,48}.

The headline bench sits at 297 utt/s (5.94x) with B=32 + fused frontend +
oneshot2 at its default block_q=512 (grid=(B,1) at Tq=499->512). Smaller
q blocks add grid steps that could pipeline DMA against compute (the
bias panel re-fetches per q block though — [16, bq, 512] slices), and
B=48 sits between the measured 32 (win) and 64 (slightly behind).

Same chained-dependency timing as bench.py. Run on the real chip:
    python scripts/exp_blockq.py

MEASURED (v5e, bf16, r03): the shipping default wins every case —
    block_q=512 B=32: 296.74 utt/s   (the default)
    block_q=256 B=32: 287.23
    block_q=128 B=32: 282.30
    block_q=512 B=48: 284.78
    block_q=256 B=48: 275.63
Smaller q blocks lose twice: the [16, bq, 512] bias panel re-fetches per
q block, and each kernel instance does less MXU work per softmax pass.
B=48 sits below B=32 like B=64 does. NEGATIVE — defaults unchanged.
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CASES = [
    ("512", 32), ("256", 32), ("128", 32),
    ("512", 48), ("256", 48),
]


def run_case(block_q: str, batch: int) -> str:
    code = f"""
import dataclasses, time, numpy as np, jax, jax.numpy as jnp
from interspeech_ser_tpu.models.speech import SpeechEncoderModel, wavlm_large, default_fused_frontend
cfg = dataclasses.replace(wavlm_large(dtype="bfloat16"), inference_kernels=True)
model = SpeechEncoderModel(cfg, fused_frontend=default_fused_frontend(cfg))
import numpy as _np
params = SpeechEncoderModel(cfg).init(
    jax.random.PRNGKey(0), jnp.zeros((1, 16000), jnp.float32),
    jnp.ones((1, 16000), jnp.float32))["params"]
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
B, T = {batch}, 160000
rng = np.random.default_rng(0)
wav = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))
mask = jnp.ones((B, T), jnp.float32)
def fwd(params, wav, mask):
    return model.apply({{"params": params}}, wav, mask)["last_hidden_state"]
@jax.jit
def chained(params, wav, mask):
    def body(i, w):
        out = fwd(params, w, mask)
        delta = jnp.sum(out.astype(jnp.float32), axis=(1, 2)) * 1e-12
        return w + delta[:, None]
    return jax.lax.fori_loop(0, 10, body, wav)
out = chained(params, wav, mask); float(out[0, 0])
best = 0.0
for _ in range(2):
    t0 = time.perf_counter(); out = chained(params, wav, mask); float(out[0, 0])
    best = max(best, B * 10 / (time.perf_counter() - t0))
print(f"RESULT {{best:.2f}} utt/s", flush=True)
"""
    env = dict(os.environ)
    env["SER_TPU_ONESHOT_BLOCK_Q"] = block_q
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True,
        text=True, timeout=1500,
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT"):
            return line.split()[1]
    return f"FAILED ({r.stderr.strip().splitlines()[-1] if r.stderr else '?'})"


if __name__ == "__main__":
    for bq, b in CASES:
        print(f"block_q={bq:>4} B={b}: {run_case(bq, b)} utt/s", flush=True)
