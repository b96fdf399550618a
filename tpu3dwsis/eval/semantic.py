"""Semantic segmentation evaluator: confusion-matrix mIoU / accuracy.

Mirrors ``evaluation/basic/sem_seg_evaluator.py:34-88`` (numpy ``add.at``
confusion accumulation, per-class IoU, mean IoU over classes present).
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

__all__ = ["SemanticEvaluator"]


class SemanticEvaluator:
    def __init__(self, class_labels: Sequence[str], ignore_label: int = -100):
        self.class_labels = list(class_labels)
        self.num_classes = len(self.class_labels)
        self.ignore_label = ignore_label
        self.reset()

    def reset(self):
        self.confusion = np.zeros((self.num_classes, self.num_classes), np.int64)

    def process(self, pred: np.ndarray, gt: np.ndarray):
        ok = (gt != self.ignore_label) & (gt >= 0) & (gt < self.num_classes)
        p = pred[ok].astype(np.int64)
        g = gt[ok].astype(np.int64)
        np.add.at(self.confusion, (g, p), 1)

    def evaluate(self) -> Dict[str, object]:
        conf = self.confusion.astype(np.float64)
        tp = np.diag(conf)
        fp = conf.sum(0) - tp
        fn = conf.sum(1) - tp
        denom = tp + fp + fn
        iou = np.where(denom > 0, tp / np.maximum(denom, 1), np.nan)
        acc = tp.sum() / max(conf.sum(), 1)
        return {
            "miou": float(np.nanmean(iou)),
            "acc": float(acc),
            "class_iou": {c: float(iou[i]) for i, c in enumerate(self.class_labels)},
        }
