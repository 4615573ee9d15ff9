"""Challenge-baseline waveform data stack.

Ports reference benchmark/utils/dataset/dataset.py (WavSet z-norm + 12-s
cap), normalizer.py (streaming mean/std), utils/data/wav.py (parallel wav
loading), and collate_fn.py (pad + sample-level attention masks), with
static-shape TPU batching: batches pad to bucketed sample lengths with a
per-row validity mask.

Norm-stat pickles stay byte-compatible with the reference's
``train_norm_stat.pkl`` (a pickled ``(mean, std)`` tuple —
train_cat_ser.py:96, dataset.py:165-167).
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import pickle
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..utils.audio import load_wav


def load_audio(audio_path: str, utts: Sequence[str], num_workers: int = 24) -> List[np.ndarray]:
    """Parallel wav loading (reference utils/data/wav.py:10-15, Pool(24))."""
    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        return list(pool.map(lambda u: load_wav(os.path.join(audio_path, u))[0], utts))


def get_norm_stat_for_wav(wav_list: Sequence[np.ndarray]) -> Tuple[float, float]:
    """Streaming scalar mean/std over all samples (normalizer.py:2-16)."""
    count, wav_sum, wav_sqsum = 0, 0.0, 0.0
    for w in wav_list:
        wav_sum += float(np.sum(w))
        wav_sqsum += float(np.sum(np.square(w, dtype=np.float64)))
        count += len(w)
    mean = wav_sum / count
    var = wav_sqsum / count - mean ** 2
    return mean, float(np.sqrt(var))


def save_norm_stat(path: str, wav_mean: float, wav_std: float) -> None:
    with open(path, "wb") as f:
        pickle.dump((wav_mean, wav_std), f)


def load_norm_stat(path: str) -> Tuple[float, float]:
    with open(path, "rb") as f:
        mean, std = pickle.load(f)
    return float(mean), float(std)


class WavDataset:
    """z-normalized waveforms with the reference's 12-s cap."""

    def __init__(
        self,
        wav_list: Sequence[np.ndarray],
        labels: Optional[np.ndarray] = None,
        utts: Optional[Sequence[str]] = None,
        wav_mean: Optional[float] = None,
        wav_std: Optional[float] = None,
        max_dur: int = 12,
        sr: int = 16000,
        normalize_wav: bool = True,
        processor_fn=None,
    ):
        self.wav_list = list(wav_list)
        self.labels = labels
        self.utts = list(utts) if utts is not None else None
        # reference dataset.py:160: min(longest wav, 12 s)
        self.max_dur = int(
            min(max(len(w) for w in self.wav_list), max_dur * sr)
        )
        self.normalize_wav = normalize_wav
        # optional feature-extractor hook (reference WavSet whisper/w2v2
        # processor variants, dataset.py:185-200), e.g. ops.mel.whisper_log_mel
        self.processor_fn = processor_fn
        # optional waveform augmentation applied BEFORE normalization
        # (reference WavSet timbre perturbation, dataset.py:176-179)
        self.augment_fn = None
        if wav_mean is None or wav_std is None:
            wav_mean, wav_std = get_norm_stat_for_wav(self.wav_list)
        self.wav_mean = float(wav_mean)
        self.wav_std = float(wav_std)

    def __len__(self) -> int:
        return len(self.wav_list)

    def get(self, idx: int) -> Tuple[np.ndarray, int]:
        w = self.wav_list[idx][: self.max_dur]
        if self.augment_fn is not None:
            w = np.asarray(self.augment_fn(w))
        if self.normalize_wav:
            w = (w - self.wav_mean) / (self.wav_std + 1e-6)
        w = w.astype(np.float32)
        if self.processor_fn is not None:
            return np.asarray(self.processor_fn(w)), len(w)
        return w, len(w)

    def save_norm_stat(self, path: str) -> None:
        save_norm_stat(path, self.wav_mean, self.wav_std)


@dataclass
class WavBatch:
    wav: np.ndarray  # [B, L] padded
    mask: np.ndarray  # [B, L] sample-level attention mask
    labels: Optional[np.ndarray]  # [B, C]
    sample_mask: np.ndarray  # [B] row validity (static batch padding)
    utts: List[str]


def collate_wav(
    dataset: WavDataset,
    indices: Sequence[int],
    batch_size: int,
    quantum: int = 16000,
) -> WavBatch:
    """Pad to bucketed length + fixed batch rows (collate_fn.py:38-62)."""
    items = [dataset.get(i) for i in indices]
    max_len = max(d for _, d in items)
    L = max(quantum, ((max_len + quantum - 1) // quantum) * quantum)
    B = batch_size
    wav = np.zeros((B, L), np.float32)
    mask = np.zeros((B, L), np.float32)
    sample_mask = np.zeros((B,), np.float32)
    labels = None
    if dataset.labels is not None:
        labels = np.zeros((B, dataset.labels.shape[1]), np.float32)
    utts = [""] * B
    for row, (idx, (w, dur)) in enumerate(zip(indices, items)):
        wav[row, :dur] = w
        mask[row, :dur] = 1.0
        sample_mask[row] = 1.0
        if labels is not None:
            labels[row] = dataset.labels[idx]
        if dataset.utts is not None:
            utts[row] = dataset.utts[idx]
    return WavBatch(wav, mask, labels, sample_mask, utts)


def epoch_batches(
    n: int,
    batch_size: int,
    rng: np.random.Generator,
    shuffle: bool,
    lengths: Optional[np.ndarray] = None,
    bucket_window: int = 8,
) -> List[List[int]]:
    order = rng.permutation(n) if shuffle else np.arange(n)
    if lengths is not None and bucket_window > 1:
        window = batch_size * bucket_window
        chunks = []
        for s in range(0, n, window):
            chunk = order[s : s + window]
            chunks.append(chunk[np.argsort(lengths[chunk], kind="stable")])
        order = np.concatenate(chunks) if chunks else order
    return [list(order[i : i + batch_size]) for i in range(0, n, batch_size)]


class TxtDataset:
    """Tokenized transcripts (reference TxtSet, dataset.py:122-141)."""

    def __init__(self, texts: Sequence[str], tokenize, max_length: int = 80):
        self.texts = [t if isinstance(t, str) else "" for t in texts]
        self.tokenize = tokenize
        self.max_length = max_length

    def __len__(self) -> int:
        return len(self.texts)

    def get(self, idx: int):
        toks = self.tokenize([self.texts[idx]])
        return np.asarray(toks["input_ids"])[0], np.asarray(toks["attention_mask"])[0]


def collate_txt_wav(
    wav_dataset: WavDataset,
    txt_dataset: TxtDataset,
    indices: Sequence[int],
    batch_size: int,
    quantum: int = 16000,
):
    """Joint text+wav collate (reference collate_fn_txt_wav_lab_mask,
    collate_fn.py:5-36) → (WavBatch, text_ids [B, L], text_mask [B, L])."""
    wav_batch = collate_wav(wav_dataset, indices, batch_size, quantum)
    items = [txt_dataset.get(i) for i in indices]
    L = max(len(ids) for ids, _ in items)
    ids = np.zeros((batch_size, L), np.int64)
    mask = np.zeros((batch_size, L), np.int64)
    for row, (tid, tm) in enumerate(items):
        ids[row, : len(tid)] = tid
        mask[row, : len(tm)] = tm
    return wav_batch, ids, mask


def inverse_freq_sample_weights(onehot_labels) -> "np.ndarray":
    """Per-sample inverse-class-frequency sampling probabilities.

    WeightedRandomSampler semantics (reference
    bin/old/train_cat_baselinelike_focalloss.py:167-186): p(sample) ∝
    1/freq(class(sample)), normalized to sum 1 (any per-class scale factor
    cancels in the normalization). Shared by the baseline, x-vector and
    joint engines.
    """
    import numpy as np

    labs = np.asarray(onehot_labels)
    freq = labs.sum(axis=0).astype(np.float64)
    inv = np.where(freq > 0, 1.0 / np.maximum(freq, 1), 0.0)
    y_idx = np.argmax(labs, axis=1)
    w = inv[y_idx]
    return w / w.sum()
