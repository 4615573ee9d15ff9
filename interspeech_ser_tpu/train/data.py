"""Lazy cached-embedding data pipeline with static-shape TPU batching.

Reference contract (bin/train_cat_bimodal_lazy_1head.py:209-234): each sample
is 2-3 per-utterance ``.pt`` feature files named ``<utt>.pt`` under the
config's ``lazy_dir{1,2,3}``, labels are one-hot rows from the merged CSV.
The reference pads each batch to its max length with no masks and loads
files synchronously in the main process (the true bottleneck, SURVEY.md §3.2).

TPU-native redesign:
- **Static shapes**: every batch is padded to a *bucketed* time length
  (multiples of ``bucket_quantum``) and a fixed batch size, with per-frame
  masks and a per-row validity mask, so XLA compiles a handful of shapes.
- **Window bucketing**: sample order follows the reference's sampler
  semantics (shuffle, or weighted-with-replacement); within a window of
  consecutive batches, samples are regrouped by length to cut padding waste
  without breaking sampling statistics. ``bucket_window=1`` disables.
- **Threaded prefetch**: feature files for upcoming batches load on a
  background thread pool while the device computes (replaces the reference's
  synchronous main-process ``torch.load``).
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import sys
import threading
from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from ..utils import ptio


def bucket_length(t: int, quantum: int = 64, minimum: int = 64) -> int:
    """Round ``t`` up to the bucket grid (static-shape compile cache)."""
    return max(minimum, ((t + quantum - 1) // quantum) * quantum)


@dataclass
class Batch:
    """Host-side numpy batch, statically shaped.

    feats:  list of [B, T_m, D_m] float32 arrays (one per modality)
    masks:  list of [B, T_m] float32 frame-validity masks
    labels: [B, C] float32 one-hot rows (zeros for padded rows)
    sample_mask: [B] float32, 0 for padding rows appended to fill the batch
    utts:   list of B utterance file names ('' for padding rows)
    """

    feats: List[np.ndarray]
    masks: List[np.ndarray]
    labels: np.ndarray
    sample_mask: np.ndarray
    utts: List[str]
    aux: Optional[np.ndarray] = None  # e.g. gender targets (grl/aux variants)


class LazyFeatureDataset:
    """Per-utterance ``.pt`` features from 2-3 lazy dirs + one-hot labels."""

    def __init__(
        self,
        utt_names: Sequence[str],
        labels: np.ndarray,
        lazy_dirs: Sequence[str],
        feat_dims: Sequence[int],
        num_workers: int = 8,
        aux_labels: Optional[np.ndarray] = None,
    ):
        assert len(utt_names) == len(labels)
        self.utt_names = list(utt_names)
        self.labels = np.asarray(labels, dtype=np.float32)
        self.aux_labels = None if aux_labels is None else np.asarray(aux_labels)
        self.lazy_dirs = list(lazy_dirs)
        self.feat_dims = list(feat_dims)
        self.pool = cf.ThreadPoolExecutor(max_workers=num_workers)
        self._verbose_once = True
        self._echo_lock = threading.Lock()

    def __len__(self) -> int:
        return len(self.utt_names)

    def _paths(self, idx: int) -> List[str]:
        stem = self.utt_names[idx].replace(".wav", ".pt")
        return [os.path.join(d, stem) for d in self.lazy_dirs]

    def load_features(self, idx: int) -> List[np.ndarray]:
        paths = self._paths(idx)
        if self._verbose_once:
            # first-sample echo, mirroring the reference's sanity print
            # (bin/train_cat_bimodal_lazy_1head.py:222-225). load_features
            # runs on pool threads: the lock makes the test-and-clear
            # atomic (a bare check-then-set let several first-batch
            # workers all pass the check → duplicate lines), and the line
            # goes out as ONE write so it can't interleave mid-line in
            # the dryrun tail (MULTICHIP_r04.json) — the one artifact a
            # machine parses.
            with self._echo_lock:
                emit, self._verbose_once = self._verbose_once, False
            if emit:
                sys.stdout.write(" ".join(paths) + "\n")
        feats = []
        for p, d in zip(paths, self.feat_dims):
            arr = np.asarray(ptio.load_tensor(p), dtype=np.float32)
            if arr.ndim == 1:
                arr = arr[None, :]
            # trimodal quirk: prosody saved [T, D] already (squeeze(-1) no-op)
            assert arr.shape[-1] == d, f"{p}: feat dim {arr.shape[-1]} != {d}"
            feats.append(arr)
        return feats

    def collate(self, indices: Sequence[int], batch_size: int, quantum: int = 64) -> Batch:
        """Load + pad ``indices`` into a statically shaped batch of ``batch_size``."""
        feats_per_sample = list(self.pool.map(self.load_features, indices))
        n_mod = len(self.lazy_dirs)
        B = batch_size
        t_max = [
            bucket_length(max(f[m].shape[0] for f in feats_per_sample), quantum)
            for m in range(n_mod)
        ]
        feats = [np.zeros((B, t_max[m], self.feat_dims[m]), np.float32) for m in range(n_mod)]
        masks = [np.zeros((B, t_max[m]), np.float32) for m in range(n_mod)]
        labels = np.zeros((B, self.labels.shape[1]), np.float32)
        sample_mask = np.zeros((B,), np.float32)
        aux = None if self.aux_labels is None else np.zeros((B,), self.aux_labels.dtype)
        utts = [""] * B
        for row, (idx, fs) in enumerate(zip(indices, feats_per_sample)):
            for m in range(n_mod):
                t = fs[m].shape[0]
                feats[m][row, :t] = fs[m]
                masks[m][row, :t] = 1.0
            labels[row] = self.labels[idx]
            sample_mask[row] = 1.0
            if aux is not None:
                aux[row] = self.aux_labels[idx]
            utts[row] = self.utt_names[idx]
        return Batch(feats, masks, labels, sample_mask, utts, aux)


def weighted_sample_indices(
    weights: np.ndarray, num_samples: int, rng: np.random.Generator
) -> np.ndarray:
    """torch ``WeightedRandomSampler(replacement=True)`` semantics."""
    p = np.asarray(weights, dtype=np.float64)
    p = p / p.sum()
    return rng.choice(len(p), size=num_samples, replace=True, p=p)


def epoch_batches(
    dataset: LazyFeatureDataset,
    batch_size: int,
    rng: np.random.Generator,
    shuffle: bool = True,
    sample_weights: Optional[np.ndarray] = None,
    bucket_window: int = 8,
    drop_last: bool = False,
) -> List[List[int]]:
    """Index batches for one epoch.

    Ordering follows the reference sampler (shuffle / weighted w/
    replacement); within windows of ``bucket_window`` consecutive batches,
    samples are re-sorted by primary-modality length so same-batch lengths
    cluster (padding waste ↓, throughput ↑) while global order stays random.
    """
    n = len(dataset)
    if sample_weights is not None:
        order = weighted_sample_indices(sample_weights, n, rng)
    elif shuffle:
        order = rng.permutation(n)
    else:
        order = np.arange(n)

    if bucket_window > 1:
        window = batch_size * bucket_window
        chunks = []
        lengths = _primary_lengths(dataset)
        for start in range(0, n, window):
            chunk = order[start : start + window]
            chunk = chunk[np.argsort(lengths[chunk], kind="stable")]
            chunks.append(chunk)
        order = np.concatenate(chunks) if chunks else order

    batches = [list(order[i : i + batch_size]) for i in range(0, n, batch_size)]
    if drop_last and batches and len(batches[-1]) < batch_size:
        batches.pop()
    return batches


def _primary_lengths(dataset: LazyFeatureDataset) -> np.ndarray:
    """Cheap per-utterance length proxy for bucketing.

    Reads each primary-modality ``.pt`` header once (file size is a faithful
    monotone proxy for T since D is constant) and caches ON the dataset
    instance. (An earlier ``id(dataset)``-keyed module dict could hand a new
    dataset the stale sizes of a garbage-collected one at the same address —
    argsorting a stale LONGER array then emits out-of-range indices, which
    crashed eval in any process that builds several datasets sequentially.)
    """
    sizes = getattr(dataset, "_primary_length_sizes", None)
    if sizes is None:
        sizes = np.zeros(len(dataset), dtype=np.int64)
        for i in range(len(dataset)):
            p = dataset._paths(i)[0]
            try:
                sizes[i] = os.path.getsize(p)
            except OSError:
                sizes[i] = 0
        dataset._primary_length_sizes = sizes
    return sizes


class PrefetchLoader:
    """Background-thread batch producer: load/pad N batches ahead."""

    def __init__(
        self,
        dataset: LazyFeatureDataset,
        batches: List[List[int]],
        batch_size: int,
        quantum: int = 64,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batches = batches
        self.batch_size = batch_size
        self.quantum = quantum
        self.queue: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self.thread = threading.Thread(target=self._produce, daemon=True)
        self.thread.start()

    def _produce(self):
        try:
            for idxs in self.batches:
                self.queue.put(
                    self.dataset.collate(idxs, self.batch_size, self.quantum)
                )
            self.queue.put(None)
        except BaseException as e:  # surface loader errors to the consumer
            self.queue.put(e)

    def __iter__(self):
        while True:
            item = self.queue.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def __len__(self):
        return len(self.batches)
