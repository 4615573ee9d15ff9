#!/usr/bin/env python
"""Full perf-ledger bench suite — every headline metric, one JSON artifact.

Re-measures on the real chip everything STATUS.md used to claim from
one-off script runs: the six-encoder extraction zoo, whisper greedy-decode
throughput, the fusion training step, and the baseline end-to-end
fine-tune. Writes ONE machine-readable artifact with per-metric noise
bands (utils/benchsuite.py schema) and can diff two artifacts, failing
loudly on out-of-band regressions — the round-over-round guard the prose
tables never provided. ``bench.py``'s one-line driver contract is
untouched.

Usage:
  python scripts/bench_suite.py --out BENCH_SUITE_r05.json   # measure all
  python scripts/bench_suite.py --metrics wavlm,whisper_decode --out f.json
  python scripts/bench_suite.py --compare old.json new.json   # exit 1 on
                                                              # regression
  python scripts/bench_suite.py --table BENCH_SUITE_r05.json  # STATUS md

Reference context: the metrics cover the hot paths of
preprocessing/preprocess_{speech,whisper,roberta,deroberta}.py, the
Whisper transcriptions notebook's decode loop, and the bin/ + benchmark/
training envelopes (SURVEY.md §3).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.utils.benchsuite import (
    compare_suites,
    format_table,
    load_suite,
    metric_entry,
)

N_REP = int(os.environ.get("SER_TPU_BENCH_REPS", 3))


def _zoo(family, batch):
    import scripts.bench_zoo as z

    from interspeech_ser_tpu.models.speech import (
        hubert_xlarge, wav2vec2_xlsr_2b, wavlm_large,
    )

    if family == "whisper":
        return z.bench_whisper(batch, n_rep=N_REP)
    if family in ("roberta", "deberta"):
        builder = z._roberta if family == "roberta" else z._deberta
        name = "roberta-large" if family == "roberta" else "deberta-v2-xxl"
        return z.bench_text(name, builder, batch, 80, n_rep=N_REP)
    cfg_fn = {"wavlm": wavlm_large, "hubert": hubert_xlarge,
              "w2v2": wav2vec2_xlsr_2b}[family]
    return z.bench_speech(family, cfg_fn, batch, n_rep=N_REP)


def bench_decode(batch=16, max_new=64):
    """KV-cached greedy decode tok/s at Whisper-large shapes (the
    test/whisper_transcriptions.py hot loop; B=16 = the r04 sweep optimum)."""
    import jax
    import jax.numpy as jnp

    from interspeech_ser_tpu.models.whisper_decoder import (
        WhisperDecoderConfig, WhisperDecoderModel, greedy_decode_cached,
    )

    cfg = WhisperDecoderConfig(dtype="bfloat16")
    dec = WhisperDecoderModel(cfg)
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.normal(size=(batch, 1500, cfg.d_model)).astype(np.float32) * 0.1)
    params = dec.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32), enc[:1, :8]
    )["params"]
    prompt = np.asarray([50258, 50259, 50360], np.int64)
    toks = greedy_decode_cached(dec, params, enc, prompt, 50257, max_new)
    np.asarray(toks)  # compile + warm
    rates = []
    for _ in range(N_REP):
        t0 = time.perf_counter()
        toks = greedy_decode_cached(dec, params, enc, prompt, 50257, max_new)
        np.asarray(toks)
        rates.append(batch * max_new / (time.perf_counter() - t0))
    print(f"whisper decode (cached, B={batch}): {max(rates):.1f} tok/s")
    return rates


# name -> (runner, unit, higher_is_better, config note)
SUITE = {
    "wavlm_extraction": (lambda: _zoo("wavlm", 32), "utt/s", True,
                         "B=32 bf16 fused-fe oneshot2, 10-s utts"),
    "hubert_extraction": (lambda: _zoo("hubert", 16), "utt/s", True,
                          "B=16 bf16 oneshot2, 10-s utts"),
    "w2v2_extraction": (lambda: _zoo("w2v2", 16), "utt/s", True,
                        "B=16 bf16, 10-s utts (2B params)"),
    "whisper_extraction": (lambda: _zoo("whisper", 8), "win/s", True,
                           "B=8 bf16 maskless+fused oneshot2, 30-s windows"),
    "roberta_extraction": (lambda: _zoo("roberta", 64), "seq/s", True,
                           "B=64 bf16, 80-tok"),
    "deberta_extraction": (lambda: _zoo("deberta", 32), "seq/s", True,
                           "B=32 bf16 windowed c2p/p2c, 80-tok"),
    "whisper_decode": (bench_decode, "tok/s", True,
                       "KV-cached greedy, B=16, T=1500 cross-K/V"),
    "fusion_train_step": (None, "ms/step", False,
                          "whisper1280+roberta1024 bs64, GRU kernel pair"),
    "baseline_train": (None, "audio-s/s", True,
                       "WavLM-large e2e fine-tune, B=8, 12-s, frozen fe"),
}


def _run_metric(name):
    if name == "fusion_train_step":
        import scripts.bench_train as bt

        return bt.bench_fusion(n_rep=N_REP)
    if name == "baseline_train":
        import scripts.bench_train as bt

        return bt.bench_baseline(n_rep=N_REP)
    return SUITE[name][0]()


def run(metrics, out_path):
    import jax

    suite = {
        "device": str(jax.devices()[0]),
        "n_rep": N_REP,
        "metrics": {},
    }
    failures = {}
    for name in metrics:
        _, unit, hib, config = SUITE[name]
        print(f"[suite] {name} ...", flush=True)
        try:
            samples = [float(s) for s in _run_metric(name)]
            if not samples:  # e.g. SER_TPU_BENCH_REPS=0
                raise RuntimeError("runner returned no samples")
            best = min(samples) if not hib else max(samples)
            entry = metric_entry(
                best, unit, samples, higher_is_better=hib, config=config
            )
        except Exception as e:  # record and continue — one failed compile
            failures[name] = f"{type(e).__name__}: {e}"  # must not hide the rest
            print(f"[suite] {name} FAILED: {failures[name]}", flush=True)
            continue
        suite["metrics"][name] = entry
    if failures:
        suite["failures"] = failures
    with open(out_path, "w") as f:
        json.dump(suite, f, indent=1)
    print(f"[suite] wrote {out_path}")
    print(format_table(suite))
    return 1 if failures else 0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None, help="measure + write artifact")
    p.add_argument("--metrics", default=None,
                   help="comma subset of: " + ",".join(SUITE))
    p.add_argument("--compare", nargs=2, metavar=("OLD", "NEW"),
                   help="diff two artifacts; exit 1 on regression")
    p.add_argument("--table", default=None,
                   help="print the STATUS markdown table for an artifact")
    args = p.parse_args(argv)

    if args.compare:
        old, new = map(load_suite, args.compare)
        regressions, notes = compare_suites(old, new)
        for n in notes:
            print("  " + n)
        if regressions:
            print("REGRESSIONS (out of noise band):")
            for r in regressions:
                print("  !! " + r)
            return 1
        print("no out-of-band regressions")
        return 0
    if args.table:
        print(format_table(load_suite(args.table)))
        return 0
    metrics = list(SUITE) if not args.metrics else args.metrics.split(",")
    unknown = [m for m in metrics if m not in SUITE]
    assert not unknown, f"unknown metrics {unknown}; known: {list(SUITE)}"
    return run(metrics, args.out or "BENCH_SUITE.json")


if __name__ == "__main__":
    sys.exit(main())
