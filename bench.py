#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): SSL-embedding extraction throughput,
utterances/sec/chip, for WavLM-large on 10-s utterances — the reference's
north-star hot path (preprocessing/preprocess_speech.py batch-1 A100
forwards; SURVEY.md §3.1). Weights are random (identical compute to the
converted checkpoint). Measures the full device path the extraction
pipeline runs per batch: conv frontend + 24-layer encoder + on-device
layer-select, f32 and bf16; reports the bf16 number (MXU path; parity mode
is f32 — see extract/pipeline.py).

``vs_baseline`` divides by 50 utt/s — a *favorable-to-the-reference*
estimate of its per-utterance batch-1 A100 path (~315 GFLOP / 10-s
utterance, latency-bound; the real reference is additionally GIL- and
I/O-bound below that). Target ≥5.

Timing notes: slope method over two loop lengths with a forced readback —
``block_until_ready`` can return early under the tunneled remote runtime.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from interspeech_ser_tpu.models.speech import SpeechEncoderModel, wavlm_large

BASELINE_A100_UTT_PER_SEC = 50.0
BATCH = 16
SECONDS = 10.0
T = int(16000 * SECONDS)


def measure(dtype: str, n_chain: int = 10) -> float:
    """Chained-dependency timing: N dependent forwards inside ONE jit.

    The tunneled runtime makes per-call timing unreliable (block_until_ready
    can return early; per-call dispatch RTT dominates) — chaining the
    forwards on-device and timing a single dispatch is the only method it
    can't fool.
    """
    cfg = wavlm_large(dtype=dtype)
    model = SpeechEncoderModel(cfg)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(BATCH, T)).astype(np.float32))
    mask = jnp.ones((BATCH, T), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), wav[:1], mask[:1])["params"]
    if dtype == "bfloat16":
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    def fwd(params, wav, mask):
        return model.apply({"params": params}, wav, mask)["last_hidden_state"]

    @jax.jit
    def chained(params, wav, mask):
        def body(i, w):
            out = fwd(params, w, mask)  # [B, T', D]
            # fold the output back into the waveform → true serial chain
            delta = jnp.sum(out.astype(jnp.float32), axis=(1, 2)) * 1e-12
            return w + delta[:, None]
        return jax.lax.fori_loop(0, n_chain, body, wav)

    out = chained(params, wav, mask)
    float(out[0, 0])  # compile + warm, forced readback

    t0 = time.perf_counter()
    out = chained(params, wav, mask)
    float(out[0, 0])
    total = time.perf_counter() - t0
    return BATCH * n_chain / total


def main():
    f32 = measure("float32")
    bf16 = measure("bfloat16")
    value = max(f32, bf16)
    print(
        json.dumps(
            {
                "metric": "wavlm_large_extraction_utt_per_sec",
                "value": round(value, 2),
                "unit": "utt/s/chip (10-s utterances)",
                "vs_baseline": round(value / BASELINE_A100_UTT_PER_SEC, 3),
                "f32_utt_per_sec": round(f32, 2),
                "bf16_utt_per_sec": round(bf16, 2),
                "device": str(jax.devices()[0]),
                "note": "baseline=50 utt/s favorable A100 batch-1 estimate; target >=5x",
            }
        )
    )


if __name__ == "__main__":
    main()
