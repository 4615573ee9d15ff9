"""Evaluation metrics: macro/micro F1, accuracy, CCC, LogManager.

Parity targets:
- macro-F1 model selection (reference: bin/train_cat_bimodal_lazy_1head.py:476
  uses ``sklearn.metrics.f1_score(average='macro')``) — host-side sklearn is
  used at epoch boundaries; a pure-numpy implementation is provided for
  environments without sklearn and verified against sklearn in tests.
- CCC loss for dimensional SER (reference: benchmark/utils/loss_manager.py:51-75).
- ``LogManager`` running-mean stat book (reference: benchmark/utils/loss_manager.py:9-49).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def _f1_per_class(y_true: np.ndarray, y_pred: np.ndarray, num_classes: int) -> np.ndarray:
    """Per-class F1 with sklearn's zero-division=0 convention."""
    f1 = np.zeros(num_classes, dtype=np.float64)
    for c in range(num_classes):
        tp = np.sum((y_pred == c) & (y_true == c))
        fp = np.sum((y_pred == c) & (y_true != c))
        fn = np.sum((y_pred != c) & (y_true == c))
        denom = 2 * tp + fp + fn
        f1[c] = (2 * tp / denom) if denom > 0 else 0.0
    return f1


def macro_f1(y_true, y_pred, num_classes: int = 8) -> float:
    """Macro-averaged F1 over ``num_classes`` classes.

    Matches ``sklearn.metrics.f1_score(y_true, y_pred, average='macro')``
    when every class appears in y_true or y_pred; classes absent from both
    still count (sklearn restricted to observed labels — we average over the
    union of observed labels to match sklearn's default `labels=None`).
    """
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    observed = np.union1d(np.unique(y_true), np.unique(y_pred))
    f1_all = _f1_per_class(y_true, y_pred, num_classes)
    return float(np.mean(f1_all[observed.astype(int)]))


def micro_f1(y_true, y_pred) -> float:
    """Micro F1 == accuracy for single-label multi-class."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    return float(np.mean(y_true == y_pred))


def accuracy(y_true, y_pred) -> float:
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    return float(np.mean(y_true == y_pred))


def concordance_ccc(pred: np.ndarray, lab: np.ndarray) -> float:
    """Concordance correlation coefficient, population (biased) moments.

    Matches the reference CCC (benchmark/utils/loss_manager.py:51-75), which
    uses mean-centred products normalised by N (torch.mean of products).
    """
    pred = np.asarray(pred, dtype=np.float64)
    lab = np.asarray(lab, dtype=np.float64)
    m_p, m_l = pred.mean(), lab.mean()
    d_p, d_l = pred - m_p, lab - m_l
    cov = np.mean(d_p * d_l)
    var_p = np.mean(d_p * d_p)
    var_l = np.mean(d_l * d_l)
    return float(2 * cov / (var_p + var_l + (m_p - m_l) ** 2 + 1e-9))


def ccc(pred, lab):
    """JAX CCC usable inside jit (per-attribute); see :func:`concordance_ccc`."""
    import jax.numpy as jnp

    m_p = jnp.mean(pred)
    m_l = jnp.mean(lab)
    d_p = pred - m_p
    d_l = lab - m_l
    cov = jnp.mean(d_p * d_l)
    var_p = jnp.mean(d_p * d_p)
    var_l = jnp.mean(d_l * d_l)
    return 2 * cov / (var_p + var_l + (m_p - m_l) ** 2 + 1e-9)


class LogManager:
    """Running stat book: named lists of floats with mean summaries.

    TPU-native counterpart of the reference LogManager
    (benchmark/utils/loss_manager.py:9-49): ``alloc_stat_type_list`` declares
    stats, ``add_torch_stat``-style adds become ``add_stat`` (floats), and
    ``print_stat`` renders only non-empty stats.
    """

    def __init__(self) -> None:
        self.stats: Dict[str, List[float]] = {}

    def alloc_stat_type(self, name: str) -> None:
        self.stats[name] = []

    def alloc_stat_type_list(self, names: Sequence[str]) -> None:
        for name in names:
            self.alloc_stat_type(name)

    def init_stat(self) -> None:
        for name in self.stats:
            self.stats[name] = []

    def add_stat(self, name: str, value) -> None:
        self.stats[name].append(float(value))

    def get_stat(self, name: str) -> float:
        vals = self.stats[name]
        return float(np.mean(vals)) if vals else 0.0

    def print_stat(self) -> str:
        parts = []
        for name, vals in self.stats.items():
            if vals:
                parts.append(f"{name}:{np.mean(vals):.4f}")
        line = " ".join(parts)
        print(line)
        return line


def calc_err(pred_logits, labels) -> float:
    """Error rate from logits (reference benchmark/utils/loss_manager.py:94-103)."""
    pred = np.asarray(pred_logits)
    lab = np.asarray(labels)
    ans = np.argmax(pred, axis=1)
    return float((len(lab) - (ans == lab).sum()) / len(lab))


def calc_acc(pred_logits, labels) -> float:
    """Accuracy from logits (loss_manager.py:105-107)."""
    return 1.0 - calc_err(pred_logits, labels)
