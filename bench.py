#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): SSL-embedding extraction throughput,
utterances/sec/chip, for WavLM-large on 10-s utterances — the reference's
north-star hot path (preprocessing/preprocess_speech.py batch-1 A100
forwards; SURVEY.md §3.1). Weights are random (identical compute to the
converted checkpoint). Measures the full device path the extraction
pipeline runs per batch: conv frontend + 24-layer encoder + on-device
layer-select, f32 and bf16; reports the best bf16 variant (MXU path;
parity mode is f32 — see extract/pipeline.py).

The bf16 path is self-tuning over a SMALL curated config set (batch 32/64,
fused conv-frontend prefix on/off): each variant is numerically
parity-checked against the plain path before it may set the headline, and
any compile/runtime failure just drops that variant — an untested kernel
can never regress or corrupt the number. Winners observed on hardware:
B=32 > B=16 (+4%, r02); oneshot2 attention default (+8-10%, r03); fused
conv0 prefix depth 1 (+1.5%, r03). Fused qkv measured a LOSS on chip
(−8% at B=32, r03) and left the set.

``vs_baseline`` divides by 50 utt/s — the A100 fp32 speed-of-light for
the reference's batch-1 path (383.8 GFLOP / 10-s utterance at the 19.5
TF/s fp32 CUDA-core peak = 50.8 utt/s at 100% utilization; the real
reference is host-bound far below — full derivation with measured host
components in BASELINE.md Appendix A). Target ≥5.

Timing notes: slope method over two loop lengths with a forced readback —
``block_until_ready`` can return early under the tunneled remote runtime.
"""

import dataclasses
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from interspeech_ser_tpu.models.speech import (
    SpeechEncoderModel,
    wavlm_large,
)

BASELINE_A100_UTT_PER_SEC = 50.0
SECONDS = 10.0
T = int(16000 * SECONDS)


def _init_params(cfg):
    """One full-model init; every variant derives from these params
    (bf16 = cast, fused qkv = exact relayout, fused frontend = module
    arg) — re-initializing per variant costs full init+compile round
    trips on the tunneled TPU for identical numerics."""
    return SpeechEncoderModel(cfg).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16000), jnp.float32),
        jnp.ones((1, 16000), jnp.float32),
    )["params"]


def measure(model, params, batch: int, n_chain: int = 10) -> float:
    """Chained-dependency timing: N dependent forwards inside ONE jit.

    The tunneled runtime makes per-call timing unreliable (block_until_ready
    can return early; per-call dispatch RTT dominates) — chaining the
    forwards on-device and timing a single dispatch is the only method it
    can't fool.
    """
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(batch, T)).astype(np.float32))
    mask = jnp.ones((batch, T), jnp.float32)

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
    return batch * n_chain / total


def _variant_parity_ok(model, params, ref_out, wav, mask, min_cosine=0.999) -> bool:
    """A variant's forward must agree with the plain bf16 path — a
    miscompiled kernel that runs fast but wrong must not set the headline."""
    got = np.asarray(
        model.apply({"params": params}, wav, mask)["last_hidden_state"], np.float64
    ).ravel()
    cos = float(ref_out @ got / (np.linalg.norm(ref_out) * np.linalg.norm(got) + 1e-12))
    return cos >= min_cosine


def measure_e2e(n_utts: int = 64) -> float:
    """Full pipeline (decode → bucketed batches → device → .pt writes)
    on synthetic 8-12 s wavs, random WavLM-large weights, bf16."""
    import tempfile
    import wave as wave_mod

    from interspeech_ser_tpu.extract.pipeline import SpeechExtractionPipeline
    from interspeech_ser_tpu.models.speech import default_fused_frontend

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
    model = SpeechEncoderModel(cfg, fused_frontend=default_fused_frontend(cfg))
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

    cfg_f32 = dataclasses.replace(wavlm_large(dtype="float32"), inference_kernels=True)
    f32_params = _init_params(cfg_f32)
    f32 = measure(SpeechEncoderModel(cfg_f32), f32_params, batch=32)

    cfg_bf16 = dataclasses.replace(
        wavlm_large(dtype="bfloat16"), inference_kernels=True
    )
    plain_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), f32_params)
    plain_model = SpeechEncoderModel(cfg_bf16)
    bf16 = measure(plain_model, plain_params, batch=32)

    # parity reference for the variants (small shapes — cheap)
    rng = np.random.default_rng(7)
    pwav = jnp.asarray(rng.normal(size=(2, 32000)).astype(np.float32))
    pmask = jnp.ones((2, 32000), jnp.float32)
    ref_out = np.asarray(
        plain_model.apply({"params": plain_params}, pwav, pmask)["last_hidden_state"],
        np.float64,
    ).ravel()

    variants = {}
    best, best_name = bf16, "bf16_b32"
    # fused qkv measured a clear LOSS on chip (268.5 vs 291.0 utt/s at
    # B=32 — scripts/exp_qkv_fused.py / BENCH r03 self-tune) and left the
    # variant set; the relayout stays available as an opt-in elsewhere.
    for name, (batch, ff) in {
        "bf16_b64": (64, 0),
        "bf16_b32_fusedfe": (32, 1),
        "bf16_b64_fusedfe": (64, 1),
    }.items():
        try:
            params = plain_params
            model = SpeechEncoderModel(cfg_bf16, fused_frontend=ff)
            if not _variant_parity_ok(model, params, ref_out, pwav, pmask):
                variants[name] = "parity-fail"
                continue
            v = measure(model, params, batch=batch)
            variants[name] = round(v, 2)
            if v > best:
                best, best_name = v, name
        except Exception as e:  # compile/runtime failure → drop the variant
            variants[name] = f"failed:{type(e).__name__}"

    value = max(f32, best)
    result = {
        "metric": "wavlm_large_extraction_utt_per_sec",
        "value": round(value, 2),
        "unit": "utt/s/chip (10-s utterances)",
        "vs_baseline": round(value / BASELINE_A100_UTT_PER_SEC, 3),
        "f32_utt_per_sec": round(f32, 2),
        "bf16_utt_per_sec": round(bf16, 2),
        "best_variant": best_name,
        "variants": variants,
        "device": str(jax.devices()[0]),
        "note": "baseline=50 utt/s = A100 fp32 roofline for the batch-1 "
                "reference path (BASELINE.md Appendix A); target >=5x",
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
