"""Label / transcript CSV pipeline with reference merge semantics.

Replicates (reference: bin/train_cat_bimodal_lazy_1head.py:139-177):
- left-merge of label CSV with transcript CSV on ``FileName``,
- split filtering on ``Split_Set`` ∈ {Train, Development},
- inverse-frequency class weights ``N / (C * n_c)``,
- balanced-batch per-sample weights ``(1/n_c) * C / Σ(1/n_k)``
  (train_cat_bimodal_lazy_1head.py:340-359),
- neutral-vs-rest sample weights for the ranking variants
  (train_cat_bimodal_lazy_1head_ranking.py:346-370),
and the one-hot → argmax-index label convention (L411).

Also hosts the label-preparation step of the challenge baseline
(reference: benchmark/process_labels_for_categorical.py:10-29): consensus
rows only, one-hot over the 8 emotion letters.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd

CLASSES = ["Angry", "Sad", "Happy", "Surprise", "Fear", "Disgust", "Contempt", "Neutral"]
CLASS_LETTERS = ["A", "S", "H", "U", "F", "D", "C", "N"]
LETTER_TO_NAME = dict(zip(CLASS_LETTERS, CLASSES))
INDEX_TO_LETTER = dict(enumerate(CLASS_LETTERS))


def load_merged(label_path: str, txt_path: Optional[str] = None) -> pd.DataFrame:
    """Label CSV (+ optional transcript CSV) with the reference's left merge."""
    label_df = pd.read_csv(label_path)
    if txt_path is None:
        return label_df
    text_df = pd.read_csv(txt_path)
    return label_df.merge(text_df, on="FileName", how="left")


def split(df: pd.DataFrame, split_set: str) -> pd.DataFrame:
    return df[df["Split_Set"] == split_set]


def class_weights(df: pd.DataFrame) -> np.ndarray:
    """Inverse-frequency CE weights: ``N_total / (C * n_c)`` (0 if n_c==0)."""
    freq = df[CLASSES].sum().to_dict()
    total = len(df)
    w = [total / (len(CLASSES) * freq[c]) if freq[c] != 0 else 0.0 for c in CLASSES]
    return np.asarray(w, dtype=np.float32)


def balanced_sample_weights(df: pd.DataFrame) -> np.ndarray:
    """Per-sample weights for class-balanced sampling with replacement."""
    freq = df[CLASSES].sum().to_dict()
    cw = {c: (1.0 / f if f != 0 else 0.0) for c, f in freq.items()}
    factor = len(cw) / sum(cw.values())
    cw = {c: w * factor for c, w in cw.items()}
    onehot = df[CLASSES].values
    idx = np.argmax(onehot, axis=1)
    return np.asarray([cw[CLASSES[i]] for i in idx], dtype=np.float64)


def neutral_balanced_sample_weights(df: pd.DataFrame) -> np.ndarray:
    """Neutral-vs-rest balanced weights (ranking trainers)."""
    is_neutral = df["Neutral"].values.astype(np.float64)
    groups = np.stack([is_neutral, 1.0 - is_neutral], axis=1)
    freq = groups.sum(axis=0)
    gw = np.where(freq != 0, 1.0 / np.where(freq == 0, 1.0, freq), 0.0)
    gw = gw * (len(gw) / gw.sum())
    idx = np.argmax(groups, axis=1)
    return gw[idx]


def labels_to_index(onehot: np.ndarray) -> np.ndarray:
    """One-hot (or soft) label rows → argmax class index (reference L411)."""
    return np.argmax(np.asarray(onehot), axis=1)


def neutral_margin_targets(onehot: np.ndarray) -> np.ndarray:
    """±1 neutral targets for SoftMarginLoss (ranking trainers L417-420)."""
    neutral = np.asarray(onehot)[:, -1].astype(np.int64)
    return (2 * neutral - 1).astype(np.float32)


def process_labels_for_categorical(
    consensus_csv: str, out_csv: Optional[str] = None
) -> pd.DataFrame:
    """labels_consensus.csv → one-hot processed_labels.csv.

    Reference: benchmark/process_labels_for_categorical.py:10-29 — keeps only
    rows whose ``EmoClass`` is one of the 8 letters (drops X/O non-consensus),
    emits ``FileName``, 8 one-hot columns, ``Split_Set``.
    """
    df = pd.read_csv(consensus_csv)
    df = df[df["EmoClass"].isin(CLASS_LETTERS)]
    out = pd.DataFrame({"FileName": df["FileName"].values})
    for letter, name in LETTER_TO_NAME.items():
        out[name] = (df["EmoClass"] == letter).astype(float).values
    out["Split_Set"] = df["Split_Set"].values
    if out_csv is not None:
        out.to_csv(out_csv, index=False)
    return out
