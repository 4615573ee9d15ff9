"""MSP-Podcast label loaders (challenge-baseline data contract).

Port of reference benchmark/utils/data/podcast.py:4-72: split-name map,
categorical one-hot loader, dimensional (arousal/dominance/valence)
loaders, and speaker-id loader with dense re-indexing.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd

SPLIT_MAP = {
    "train": "Train",
    "dev": "Development",
    "test1": "Test1",
    "test2": "Test2",
    "test3": "Test3",
}

CAT_COLUMNS = ["Angry", "Sad", "Happy", "Surprise", "Fear", "Disgust", "Contempt", "Neutral"]
ADV_COLUMNS = ["EmoAct", "EmoDom", "EmoVal"]


def _split_df(label_path: str, dtype: str) -> pd.DataFrame:
    df = pd.read_csv(label_path, sep=",")
    return df[df["Split_Set"] == SPLIT_MAP[dtype]]


def load_utts(label_path: str, dtype: str) -> np.ndarray:
    return _split_df(label_path, dtype)["FileName"].to_numpy()


def load_cat_emo_label(label_path: str, dtype: str) -> Tuple[np.ndarray, np.ndarray]:
    df = _split_df(label_path, dtype)
    return df["FileName"].to_numpy(), df[CAT_COLUMNS].to_numpy()


def load_adv_emo_label(label_path: str, dtype: str) -> Tuple[np.ndarray, np.ndarray]:
    df = _split_df(label_path, dtype)
    return df["FileName"].to_numpy(), df[ADV_COLUMNS].to_numpy()


def load_adv_arousal(label_path: str, dtype: str):
    df = _split_df(label_path, dtype)
    return df["FileName"].to_numpy(), df[["EmoAct"]].to_numpy()


def load_adv_dominance(label_path: str, dtype: str):
    df = _split_df(label_path, dtype)
    return df["FileName"].to_numpy(), df[["EmoDom"]].to_numpy()


def load_adv_valence(label_path: str, dtype: str):
    df = _split_df(label_path, dtype)
    return df["FileName"].to_numpy(), df[["EmoVal"]].to_numpy()


def load_spk_id(label_path: str, dtype: str):
    """Speaker ids densified to 0..N-1 (reference podcast.py:60-72)."""
    df = _split_df(label_path, dtype)
    df = df[df["SpkrID"] != "Unknown"]
    utts = df["FileName"].to_numpy()
    spk = df["SpkrID"].to_numpy().astype(np.int64)
    uniq = sorted(set(spk.tolist()))
    remap = {old: new for new, old in enumerate(uniq)}
    spk = np.asarray([remap[s] for s in spk], dtype=np.int64)
    return utts, spk, len(uniq)
