#!/usr/bin/env python
"""Generate the shipped pretrained-baseline norm-stat artifact.

The reference ships ``benchmark/model/cat_ser/7/train_norm_stat.pkl`` — a
137-byte pickle of ``(wav_mean, wav_std)`` computed over the MSP-Podcast
train-split waveforms (reference: benchmark/utils/dataset/normalizer.py:2-16,
benchmark/train_eval_files/train_cat_ser.py:96). Those two floats are the
compatibility contract for loading the authors' pretrained categorical
baseline: eval must z-normalize with the SAME stats the model was trained
with (reference: benchmark/train_eval_files/eval_cat_ser.py:104).

Two modes:

  --wav_dir DIR [--label_path CSV]
      Recompute the stats from a local train split (streaming mean/std via
      interspeech_ser_tpu.baseline.data.get_norm_stat_for_wav) — the honest
      path once MSP-Podcast audio is mountable.

  (no --wav_dir)
      Write the published values carried by the reference artifact
      (mean=-8.061416759804387e-05, std=0.08862083754837842). These are
      dataset statistics, not code; shipping them is what makes the
      pretrained checkpoint loadable without the (license-gated) corpus.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from interspeech_ser_tpu.baseline import data as bdata

# Values carried by the reference's shipped benchmark/model/cat_ser/7/
# train_norm_stat.pkl (MSP-Podcast train split, scalar waveform stats).
PUBLISHED_MEAN = -8.061416759804387e-05
PUBLISHED_STD = 0.08862083754837842


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav_dir", type=str, default=None)
    ap.add_argument("--label_path", type=str, default=None)
    ap.add_argument(
        "--out",
        type=str,
        default=os.path.join(
            os.path.dirname(__file__), "..", "benchmark", "model", "cat_ser", "7",
            "train_norm_stat.pkl",
        ),
    )
    args = ap.parse_args()

    if args.wav_dir:
        import pandas as pd

        if args.label_path:
            df = pd.read_csv(args.label_path)
            utts = list(df[df["Split_Set"] == "Train"]["FileName"])
        else:
            utts = sorted(os.listdir(args.wav_dir))
        waves = bdata.load_audio(args.wav_dir, utts)
        mean, std = bdata.get_norm_stat_for_wav(waves)
        print(f"computed over {len(waves)} wavs: mean={mean} std={std}")
    else:
        mean, std = PUBLISHED_MEAN, PUBLISHED_STD
        print(f"writing published reference stats: mean={mean} std={std}")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    bdata.save_norm_stat(args.out, mean, std)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
