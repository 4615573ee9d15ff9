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

from interspeech_ser_tpu.models.speech import (
    SpeechEncoderModel,
    default_fused_frontend,
    wavlm_large,
)

BASELINE_A100_UTT_PER_SEC = 50.0
# B=32 matches the extraction pipeline's default token budget (320 s of
# audio per batch); measured on v5e: 258.7 utt/s at B=32 vs 248.2 at B=16
# (conv frontend tiles better at the larger batch).
BATCH = 32
SECONDS = 10.0
T = int(16000 * SECONDS)


def measure(dtype: str, n_chain: int = 10, fused_frontend: int = 0) -> float:
    """Chained-dependency timing: N dependent forwards inside ONE jit.

    The tunneled runtime makes per-call timing unreliable (block_until_ready
    can return early; per-call dispatch RTT dominates) — chaining the
    forwards on-device and timing a single dispatch is the only method it
    can't fool.
    """
    import dataclasses

    # inference-only bench: opt into the no-vjp Pallas kernels, exactly
    # as SpeechExtractionPipeline does
    cfg = dataclasses.replace(wavlm_large(dtype=dtype), inference_kernels=True)
    model = SpeechEncoderModel(cfg, fused_frontend=fused_frontend)
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


def _fused_parity_ok(min_cosine: float = 0.999) -> bool:
    """Fused-frontend forward must agree with the XLA path (bf16)."""
    import dataclasses

    cfg = dataclasses.replace(wavlm_large(dtype="bfloat16"), inference_kernels=True)
    rng = np.random.default_rng(7)
    wav = jnp.asarray(rng.normal(size=(2, 32000)).astype(np.float32))
    mask = jnp.ones((2, 32000), jnp.float32)
    ref_m = SpeechEncoderModel(cfg)
    params = ref_m.init(jax.random.PRNGKey(0), wav, mask)["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    a = np.asarray(
        ref_m.apply({"params": params}, wav, mask)["last_hidden_state"],
        np.float64,
    ).ravel()
    b = np.asarray(
        SpeechEncoderModel(cfg, fused_frontend=2).apply(
            {"params": params}, wav, mask
        )["last_hidden_state"],
        np.float64,
    ).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    return cos >= min_cosine


def measure_e2e(n_utts: int = 64) -> float:
    """Full pipeline (decode → bucketed batches → device → .pt writes)
    on synthetic 8-12 s wavs, random WavLM-large weights, bf16."""
    import tempfile
    import wave as wave_mod

    from interspeech_ser_tpu.extract.pipeline import SpeechExtractionPipeline
    from interspeech_ser_tpu.models.speech import SpeechEncoderModel as M

    rng = np.random.default_rng(1)
    tmp = tempfile.mkdtemp(prefix="bench_wavs_")
    for i in range(n_utts):
        # 9.1-10 s: all utterances land in one 10-s bucket → one compile
        n = int(16000 * (9.1 + 0.9 * rng.random()))
        pcm = (np.clip(rng.normal(size=n) * 0.1, -1, 1) * 32767).astype("<i2")
        with wave_mod.open(f"{tmp}/u{i:03d}.wav", "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())

    cfg = wavlm_large(dtype="bfloat16")
    model = M(cfg, fused_frontend=default_fused_frontend(cfg))
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16000), jnp.float32),
        jnp.ones((1, 16000), jnp.float32),
    )["params"]
    out = tempfile.mkdtemp(prefix="bench_feats_")
    pipe = SpeechExtractionPipeline(model, params, cfg)
    pipe.run(tmp, out)  # warm (compile per bucket)
    stats = pipe.run(tmp, tempfile.mkdtemp(prefix="bench_feats2_"))
    return stats.utts_per_sec


def _probe_device(timeout_s: float = 300.0) -> None:
    """Fail fast (exit 3) if the axon TPU tunnel is unreachable.

    The tunneled backend can hang ``jax.devices()`` indefinitely when the
    tunnel is down (observed multi-hour outages); probing in a subprocess
    with a hard timeout turns that hang into an honest, bounded failure
    the driver can record instead of a stuck process. No CPU fallback:
    a host-mesh number would not be comparable to the hardware metric.
    """
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        if r.returncode == 0:
            return
        msg = r.stderr.decode(errors="replace")[-500:]
    except subprocess.TimeoutExpired:
        msg = f"jax.devices() probe timed out after {timeout_s:.0f}s"
    print(
        "BENCH ABORTED: TPU backend unreachable (axon tunnel down?). "
        f"{msg} — last hardware-measured value: see BENCH_r02.json "
        "(259.76 utt/s, 5.195x). Code path unchanged; re-run when the "
        "tunnel is up.",
        file=sys.stderr,
    )
    sys.exit(3)


def main():
    import os

    _probe_device()
    f32 = measure("float32")
    bf16 = measure("bfloat16")
    # fused conv-frontend Pallas prefix: self-protecting A/B — measured
    # alongside the XLA frontend and only the winner is reported, so an
    # untested Mosaic compile can never regress the headline. Guarded
    # twice: any compile/runtime failure falls back, and the fused
    # forward must match the XLA forward numerically (a miscompiled
    # kernel that runs fast but wrong must not set the headline).
    try:
        bf16_fused = measure("bfloat16", fused_frontend=2)
        if not _fused_parity_ok():
            bf16_fused = 0.0
    except Exception:
        bf16_fused = 0.0
    value = max(f32, bf16, bf16_fused)
    result = {
        "metric": "wavlm_large_extraction_utt_per_sec",
        "value": round(value, 2),
        "unit": "utt/s/chip (10-s utterances)",
        "vs_baseline": round(value / BASELINE_A100_UTT_PER_SEC, 3),
        "f32_utt_per_sec": round(f32, 2),
        "bf16_utt_per_sec": round(bf16, 2),
        "bf16_fused_frontend_utt_per_sec": round(bf16_fused, 2),
        "device": str(jax.devices()[0]),
        "note": "baseline=50 utt/s favorable A100 batch-1 estimate; target >=5x",
    }
    # Full-pipeline e2e (decode+batch+device+save) is gated behind an env
    # flag: over this image's tunneled TPU the D2H hop rides the network
    # and the number is dominated by tunnel variance (measured 3-8 utt/s
    # across runs for the same code) — meaningless for a co-located TPU VM.
    if os.environ.get("SER_TPU_BENCH_E2E") == "1":
        result["e2e_pipeline_utt_per_sec"] = round(measure_e2e(), 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
