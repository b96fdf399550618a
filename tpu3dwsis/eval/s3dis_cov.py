"""S3DIS coverage metrics: mCov / mWCov / mPrec / mRec@IoU0.5.

Re-implementation of ``utils/eval_s3dis.py:5-157`` (ASIS-style protocol):

* per scene and class, each GT instance contributes its best-IoU over
  same-class predictions (mCov plain mean, mWCov point-count weighted);
* precision/recall at IoU 0.5 with the ASIS convention that a GT can match
  multiple predictions (the ``gtflag`` de-dup line is commented out
  upstream — kept identical here).
"""
from __future__ import annotations

from typing import Dict

import numpy as np
from scipy import stats

__all__ = ["S3DISCoverageEvaluator"]


class S3DISCoverageEvaluator:
    def __init__(self, num_classes: int = 13, iou_threshold: float = 0.5):
        self.num_classes = num_classes
        self.iou_threshold = iou_threshold
        self.total_gt = np.zeros(num_classes)
        self.tp = [[] for _ in range(num_classes)]
        self.fp = [[] for _ in range(num_classes)]
        self.cov = [[] for _ in range(num_classes)]
        self.wcov = [[] for _ in range(num_classes)]

    def process(
        self,
        pred_masks: np.ndarray,  # [M, N] bool
        pred_sem: np.ndarray,  # [M] class indices 0-based
        sem_gt: np.ndarray,  # [N]
        ins_gt: np.ndarray,  # [N]
    ):
        by_class_pred = [[] for _ in range(self.num_classes)]
        for sem_id, mask in zip(pred_sem, pred_masks):
            if 0 <= sem_id < self.num_classes:
                by_class_pred[int(sem_id)].append(mask.astype(bool))

        by_class_gt = [[] for _ in range(self.num_classes)]
        for ins_id in np.unique(ins_gt):
            gt_mask = ins_gt == ins_id
            gt_sem = int(stats.mode(sem_gt[gt_mask], keepdims=True)[0][0])
            if 0 <= gt_sem < self.num_classes:
                by_class_gt[gt_sem].append(gt_mask)

        for c in range(self.num_classes):
            gts, preds = by_class_gt[c], by_class_pred[c]
            if gts:
                best = []
                weights = []
                for g in gts:
                    iou_max = 0.0
                    for p in preds:
                        iou_max = max(
                            iou_max, float((g & p).sum()) / max((g | p).sum(), 1)
                        )
                    best.append(iou_max)
                    weights.append(g.sum())
                self.cov[c].append(float(np.mean(best)))
                self.wcov[c].append(float(np.average(best, weights=weights)))

            self.total_gt[c] += len(gts)
            for p in preds:
                iou_max = -1.0
                for g in gts:
                    iou_max = max(iou_max, float((g & p).sum()) / max((g | p).sum(), 1))
                if iou_max > self.iou_threshold:
                    self.tp[c].append(1.0)
                    self.fp[c].append(0.0)
                else:
                    self.tp[c].append(0.0)
                    self.fp[c].append(1.0)

    def evaluate(self) -> Dict[str, float]:
        mcov = np.array([np.mean(c) if c else np.nan for c in self.cov])
        mwcov = np.array([np.mean(c) if c else np.nan for c in self.wcov])
        prec = np.full(self.num_classes, np.nan)
        rec = np.full(self.num_classes, np.nan)
        for c in range(self.num_classes):
            tp, fp = sum(self.tp[c]), sum(self.fp[c])
            if tp + fp > 0:
                prec[c] = tp / (tp + fp)
            if self.total_gt[c] > 0:
                rec[c] = tp / self.total_gt[c]
        return {
            "mCov": float(np.nanmean(mcov)),
            "mWCov": float(np.nanmean(mwcov)),
            "mPrec": float(np.nanmean(prec)),
            "mRec": float(np.nanmean(rec)),
        }
