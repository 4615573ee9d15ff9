#!/usr/bin/env python
"""Regenerate test/train_stacking_sample.csv from a labels CSV.

The reference ships a balanced Train-split sample (8,960 rows = 1,120 per
emotion; header: unnamed index, FileName, 8 one-hot cols, Split_Set —
reference test/train_stacking_sample.csv) used by the
extract_train_cat_* CLIs to score the stacking model's training subset.
The shipped file is dataset-derived, so this repo ships a synthetic
schema-matched fixture instead; run this script against your real
processed_labels.csv to rebuild the dataset-exact sample.
"""

import argparse

import numpy as np
import pandas as pd

CLASSES = ["Angry", "Sad", "Happy", "Surprise", "Fear", "Disgust", "Contempt", "Neutral"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--label_path", default="./benchmark/processed_labels.csv")
    ap.add_argument("--out", default="./test/train_stacking_sample.csv")
    ap.add_argument("--per_class", type=int, default=1120)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    df = pd.read_csv(args.label_path)
    train = df[df["Split_Set"] == "Train"]
    rng = np.random.default_rng(args.seed)
    parts = []
    for c in CLASSES:
        rows = train[train[c] == 1.0]
        take = min(args.per_class, len(rows))
        parts.append(rows.iloc[rng.permutation(len(rows))[:take]])
    sample = pd.concat(parts).reset_index(drop=True)
    sample = sample[["FileName"] + CLASSES + ["Split_Set"]]
    sample.to_csv(args.out)  # index column matches the reference format
    print(f"wrote {len(sample)} rows to {args.out}")


if __name__ == "__main__":
    main()
