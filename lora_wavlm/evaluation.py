#!/usr/bin/env python
"""Evaluation + fairness metrics (reference lora_wavlm/evaluation.py).

``EvalMetric`` tracks accuracy / UAR / confusion / loss (reference L47-57);
the fairness metrics (demographic parity, statistical parity, equality of
opportunity — reference L59-108 via holisticai) are implemented directly
(holisticai is not in this image).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from interspeech_ser_tpu.train.lora_engine import uar


class EvalMetric:
    def __init__(self, num_classes: int = 4):
        self.num_classes = num_classes
        self.y_true, self.y_pred, self.losses = [], [], []

    def append_classification_results(self, labels, preds, loss=None):
        self.y_true.extend(np.asarray(labels).tolist())
        self.y_pred.extend(np.asarray(preds).tolist())
        if loss is not None:
            self.losses.append(float(loss))

    def classification_summary(self):
        y_true = np.asarray(self.y_true)
        y_pred = np.asarray(self.y_pred)
        conf = np.zeros((self.num_classes, self.num_classes), dtype=np.int64)
        for t, p in zip(y_true, y_pred):
            conf[int(t), int(p)] += 1
        return {
            "acc": float((y_true == y_pred).mean()) if len(y_true) else 0.0,
            "uar": uar(y_true, y_pred, self.num_classes),
            "conf": conf,
            "loss": float(np.mean(self.losses)) if self.losses else 0.0,
        }


def demographic_parity(y_pred, groups) -> float:
    """Max |P(ŷ=c | g) - P(ŷ=c | g')| over classes and group pairs."""
    y_pred = np.asarray(y_pred)
    groups = np.asarray(groups)
    uniq_g = np.unique(groups)
    max_gap = 0.0
    for c in np.unique(y_pred):
        rates = [float((y_pred[groups == g] == c).mean()) for g in uniq_g]
        max_gap = max(max_gap, max(rates) - min(rates))
    return max_gap


def statistical_parity(y_pred, groups, favorable_class) -> float:
    """P(ŷ=c | g=1) - P(ŷ=c | g=0) for a binary group coding."""
    y_pred = np.asarray(y_pred)
    groups = np.asarray(groups)
    p1 = float((y_pred[groups == 1] == favorable_class).mean())
    p0 = float((y_pred[groups == 0] == favorable_class).mean())
    return p1 - p0


def equality_of_opportunity(y_true, y_pred, groups, favorable_class) -> float:
    """TPR(g=1) - TPR(g=0) for the favorable class."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    groups = np.asarray(groups)

    def tpr(g):
        sel = (groups == g) & (y_true == favorable_class)
        return float((y_pred[sel] == favorable_class).mean()) if sel.sum() else 0.0

    return tpr(1) - tpr(0)
