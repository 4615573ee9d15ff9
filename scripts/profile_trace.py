#!/usr/bin/env python
"""Capture a jax.profiler device trace of the extraction hot path.

    python scripts/profile_trace.py [--model wavlm|whisper] [--steps 3]
    # → /tmp/ser_tpu_trace/... (open in TensorBoard profile plugin or
    #   convert the .trace.json.gz into Perfetto)

Complements scripts/profile_blocks.py (which times blocks by repeated
dispatch): the trace shows per-fusion XLA op times, HBM traffic, and
padding — the standard tool for finding the next MFU win (VERDICT.md r02
Weak #6)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="wavlm", choices=["wavlm", "whisper"])
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--log_dir", default="/tmp/ser_tpu_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from interspeech_ser_tpu.utils import profiling

    rng = np.random.default_rng(0)
    if args.model == "wavlm":
        from interspeech_ser_tpu.models.speech import SpeechEncoderModel, wavlm_large

        cfg = wavlm_large(dtype="bfloat16")
        model = SpeechEncoderModel(cfg)
        T = int(16000 * args.seconds)
        wav = jnp.asarray(rng.normal(size=(args.batch, T)).astype(np.float32))
        mask = jnp.ones((args.batch, T), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), wav[:1], mask[:1])["params"]
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

        @jax.jit
        def step(p, w, m):
            return model.apply({"params": p}, w, m)["last_hidden_state"]

        fn = lambda: step(params, wav, mask)
    else:
        from interspeech_ser_tpu.models.whisper import (
            WhisperEncoderModel, whisper_large_v3,
        )
        from interspeech_ser_tpu.ops.mel import whisper_log_mel

        cfg = whisper_large_v3(dtype="bfloat16")
        model = WhisperEncoderModel(cfg)
        wav = jnp.asarray(rng.normal(size=(8, 480000)).astype(np.float32))
        mel = whisper_log_mel(wav, num_mels=cfg.num_mel_bins)
        params = model.init(jax.random.PRNGKey(0), mel[:1])["params"]
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

        @jax.jit
        def step(p, m):
            return model.apply({"params": p}, m)["last_hidden_state"]

        fn = lambda: step(params, mel)

    out = fn()  # compile outside the trace
    float(jnp.sum(out.astype(jnp.float32)))

    with profiling.trace(args.log_dir):
        for i in range(args.steps):
            with profiling.annotate(f"extract_step_{i}"):
                out = fn()
        float(jnp.sum(out.astype(jnp.float32)))
    print(f"trace written under {args.log_dir}")


if __name__ == "__main__":
    main()
