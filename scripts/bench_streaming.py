#!/usr/bin/env python
"""Bounded-RSS proof for the streaming extraction pipeline.

Generates a synthetic ≥10k-utterance corpus, streams it through
``SpeechExtractionPipeline`` (small encoder, CPU platform by default so the
run is self-contained), samples ``/proc/self/status`` VmRSS concurrently,
and reports peak RSS vs the corpus' decoded f32 footprint. The round-2
in-memory design held the WHOLE corpus (decoded + features) in host RAM;
the streaming design must stay flat regardless of corpus size.

    python scripts/bench_streaming.py --n_utts 10000

Prints one JSON line: peak_rss_gb must stay < 4 (and, more to the point,
well under corpus_decoded_gb + baseline)."""

import argparse
import json
import os
import sys
import threading
import time
import wave as wave_mod

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6  # kB → GB
    return 0.0


class RssSampler(threading.Thread):
    def __init__(self, interval=0.1):
        super().__init__(daemon=True)
        self.peak = rss_gb()
        self.stop = threading.Event()
        self.interval = interval

    def run(self):
        while not self.stop.is_set():
            self.peak = max(self.peak, rss_gb())
            time.sleep(self.interval)


def make_corpus(root: str, n_utts: int, rng) -> float:
    """PCM16 wavs, 2-6 s; returns decoded-f32 footprint in GB."""
    os.makedirs(root, exist_ok=True)
    total = 0
    for i in range(n_utts):
        n = int(16000 * (2.0 + 4.0 * rng.random()))
        total += n
        pcm = (np.clip(rng.normal(size=n) * 0.1, -1, 1) * 32767).astype("<i2")
        with wave_mod.open(os.path.join(root, f"u{i:05d}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
    return total * 4 / 1e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_utts", type=int, default=10000)
    ap.add_argument("--corpus", type=str, default="/tmp/stream_corpus")
    ap.add_argument("--out", type=str, default="/tmp/stream_feats")
    ap.add_argument("--tpu", action="store_true", help="use the default (TPU) platform")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
        ).strip()
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from interspeech_ser_tpu.extract.pipeline import SpeechExtractionPipeline
    from interspeech_ser_tpu.models.speech import SpeechConfig, SpeechEncoderModel

    rng = np.random.default_rng(0)
    marker = os.path.join(args.corpus, f".complete_{args.n_utts}")
    if not os.path.exists(marker):
        print(f"generating {args.n_utts}-utt corpus at {args.corpus} ...", file=sys.stderr)
        decoded_gb = make_corpus(args.corpus, args.n_utts, rng)
        with open(marker, "w") as f:
            f.write(str(decoded_gb))
    decoded_gb = float(open(marker).read())

    # small encoder: the RSS profile is set by the HOST pipeline (decode,
    # assembly queue, feature fetch, writers), not by model width. Keep the
    # real 320x conv downsampling so frame counts (and attention size)
    # match production geometry.
    cfg = SpeechConfig(
        hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128,
        conv_dim=(32,) * 7, conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
        attention_type="wavlm", num_buckets=32, max_distance=64,
        num_conv_pos_embeddings=16, conv_pos_groups=4,
    )
    model = SpeechEncoderModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16000), jnp.float32),
        jnp.ones((1, 16000), jnp.float32),
    )["params"]

    pipe = SpeechExtractionPipeline(model, params, cfg)
    sampler = RssSampler()
    sampler.start()
    base = rss_gb()
    stats = pipe.run(args.corpus, args.out, wav_names=sorted(
        n for n in os.listdir(args.corpus) if n.endswith(".wav")))
    sampler.stop.set()
    sampler.join()

    result = {
        "metric": "streaming_extraction_peak_rss_gb",
        "n_utts": stats.n_utts,
        "utt_per_sec": round(stats.utts_per_sec, 2),
        "baseline_rss_gb": round(base, 3),
        "peak_rss_gb": round(sampler.peak, 3),
        "corpus_decoded_gb": round(decoded_gb, 3),
        "bounded": sampler.peak < 4.0,
    }
    print(json.dumps(result))
    assert sampler.peak < 4.0, f"RSS not bounded: peak {sampler.peak:.2f} GB"


if __name__ == "__main__":
    main()
