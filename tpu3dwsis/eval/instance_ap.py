"""ScanNet-benchmark instance AP evaluator.

Re-implementation of the full AP protocol from
``evaluation/basic/ins_seg_evaluator.py:17-347`` /
``evaluation/basic/instances.py:20-81``:

* overlaps 0.50:0.05:0.95 plus 0.25; min region 100 points;
* GT encoding ``gt_id = semantic_id * 1000 + instance_index + 1`` (ids <= 0
  are unannotated background);
* greedy confidence-bookkeeping matching per GT; duplicate matches of one GT
  keep the higher confidence and emit the lower one as a false positive;
* unmatched predictions are ignored (not counted FP) when mostly covered by
  void / too-small GT regions;
* PR curve at unique score thresholds, integrated by the [-0.5, 0, 0.5]
  convolution step-width trick; AP = mean over the 9 overlaps >= 0.5.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

__all__ = ["InstanceAPEvaluator", "encode_gt_instances"]

OVERLAPS = np.append(np.arange(0.5, 0.95, 0.05), 0.25)
MIN_REGION_SIZE = 100


def encode_gt_instances(sem_ids: np.ndarray, instance_label: np.ndarray) -> np.ndarray:
    """Encode per-point GT as ``semantic_id*1000 + inst + 1`` (0 = unannotated).

    ``sem_ids`` are dataset semantic ids (e.g. ScanNet benchmark ids) per
    point; ``instance_label`` is the 0-based instance index with -100 ignore
    (``prepare_data_inst_gttxt.py:50-62``).
    """
    out = np.zeros(len(sem_ids), np.int64)
    ok = instance_label != -100
    out[ok] = sem_ids[ok] * 1000 + instance_label[ok] + 1
    return out


class InstanceAPEvaluator:
    def __init__(self, class_ids: Sequence[int], class_labels: Sequence[str]):
        assert len(class_ids) == len(class_labels)
        self.class_ids = list(int(c) for c in class_ids)
        self.class_labels = list(class_labels)
        self.id2label = dict(zip(self.class_ids, self.class_labels))
        self.reset()

    def reset(self):
        self.matches: Dict[str, dict] = {}

    # ------------------------------------------------------------- per scene
    def process(
        self,
        scene_name: str,
        pred_masks: np.ndarray,  # [K, N] bool
        pred_label_ids: np.ndarray,  # [K] dataset semantic ids
        pred_confs: np.ndarray,  # [K]
        gt_ids: np.ndarray,  # [N] encoded GT
    ):
        """``assign_instances_for_scan`` (``ins_seg_evaluator.py:49-117``)."""
        gt2pred = {label: [] for label in self.class_labels}
        for iid in np.unique(gt_ids):
            if iid <= 0:
                continue
            label_id = int(iid // 1000)
            if label_id not in self.id2label:
                continue
            mask = gt_ids == iid
            gt2pred[self.id2label[label_id]].append(
                {
                    "instance_id": int(iid),
                    "instance_count": int(mask.sum()),
                    "matched_pred": [],
                }
            )
        pred2gt = {label: [] for label in self.class_labels}
        bool_void = ~np.isin(gt_ids // 1000, self.class_ids)

        n_pred = 0
        for i in range(len(pred_confs)):
            label_id = int(pred_label_ids[i])
            if label_id not in self.id2label:
                continue
            mask = pred_masks[i].astype(bool)
            num = int(mask.sum())
            if num < MIN_REGION_SIZE:
                continue
            label = self.id2label[label_id]
            pred = {
                "uid": f"{scene_name}_{n_pred:03d}",
                "label_id": label_id,
                "instance_count": num,
                "confidence": float(pred_confs[i]),
                "void_intersection": int((bool_void & mask).sum()),
                "matched_gt": [],
            }
            for gi, gt in enumerate(gt2pred[label]):
                inter = int(((gt_ids == gt["instance_id"]) & mask).sum())
                if inter > 0:
                    gt2pred[label][gi]["matched_pred"].append(
                        {**pred, "intersection": inter}
                    )
                    pred["matched_gt"].append(
                        {
                            "instance_id": gt["instance_id"],
                            "instance_count": gt["instance_count"],
                            "intersection": inter,
                        }
                    )
            n_pred += 1
            pred2gt[label].append(pred)

        self.matches[scene_name] = {"pred": pred2gt, "gt": gt2pred}

    # --------------------------------------------------------------- scoring
    def _ap_for(self, label: str, overlap_th: float, pred_visited: dict) -> float:
        y_true: List[float] = []
        y_score: List[float] = []
        hard_fn = 0
        has_gt = has_pred = False
        for m in self.matches.values():
            gts = [g for g in m["gt"][label] if g["instance_count"] >= MIN_REGION_SIZE]
            preds = m["pred"][label]
            has_gt |= bool(gts)
            has_pred |= bool(preds)

            cur_true: List[float] = []
            cur_score: List[float] = []
            matched_score = {}
            for gt in gts:
                found = False
                for pred in gt["matched_pred"]:
                    if pred_visited[pred["uid"]]:
                        continue
                    ov = pred["intersection"] / (
                        gt["instance_count"] + pred["instance_count"] - pred["intersection"]
                    )
                    if ov > overlap_th:
                        conf = pred["confidence"]
                        key = id(gt)
                        if key in matched_score:
                            hi = max(matched_score[key], conf)
                            lo = min(matched_score[key], conf)
                            matched_score[key] = hi
                            cur_true.append(0.0)
                            cur_score.append(lo)
                        else:
                            found = True
                            matched_score[key] = conf
                            pred_visited[pred["uid"]] = True
                if not found:
                    hard_fn += 1
                else:
                    cur_true.append(1.0)
                    cur_score.append(matched_score[id(gt)])

            for pred in preds:
                found_gt = False
                for gt in pred["matched_gt"]:
                    ov = gt["intersection"] / (
                        gt["instance_count"] + pred["instance_count"] - gt["intersection"]
                    )
                    if ov > overlap_th:
                        found_gt = True
                        break
                if not found_gt:
                    num_ignore = pred["void_intersection"]
                    for gt in pred["matched_gt"]:
                        if gt["instance_id"] < 1000:
                            num_ignore += gt["intersection"]
                        if gt["instance_count"] < MIN_REGION_SIZE:
                            num_ignore += gt["intersection"]
                    if num_ignore / pred["instance_count"] <= overlap_th:
                        cur_true.append(0.0)
                        cur_score.append(pred["confidence"])

            y_true.extend(cur_true)
            y_score.extend(cur_score)

        if not has_gt:
            return float("nan")
        if not has_pred:
            return 0.0

        y_true_a = np.asarray(y_true)
        y_score_a = np.asarray(y_score)
        order = np.argsort(y_score_a)
        ys, yt = y_score_a[order], y_true_a[order]
        cum = np.cumsum(yt)
        thresholds, uniq_idx = np.unique(ys, return_index=True)
        num = len(ys)
        num_true = cum[-1] if len(cum) else 0
        cum_ext = np.append(cum, 0)

        precision = np.zeros(len(uniq_idx) + 1)
        recall = np.zeros(len(uniq_idx) + 1)
        for r, idx in enumerate(uniq_idx):
            c = cum_ext[idx - 1]
            tp = num_true - c
            fp = num - idx - tp
            fn = c + hard_fn
            precision[r] = tp / max(tp + fp, 1e-12)
            recall[r] = tp / max(tp + fn, 1e-12)
        precision[-1] = 1.0
        recall[-1] = 0.0

        r_conv = np.concatenate([[recall[0]], recall, [0.0]])
        step = np.convolve(r_conv, [-0.5, 0, 0.5], "valid")
        return float(np.dot(precision, step))

    def prec_recall(self, threshold: float = 0.5) -> Dict[str, object]:
        """Per-class precision/recall at one IoU threshold — the table the
        reference prints for S3DIS (``print_prec_recall``,
        ``ins_seg_evaluator.py:351-431``, invoked from ``test_s3dis.py``).

        A prediction is a TP when ANY same-class GT instance overlaps it
        above ``threshold`` (no GT dedup — several predictions may claim one
        GT); Total counts every GT instance of the class (no min-size
        filter).  Computed from the stored intersections; pairs with zero
        intersection have IoU 0 and cannot pass the threshold, so skipping
        them matches the reference's full mask cross-product."""
        per: Dict[str, dict] = {}
        pre_all, rec_all = [], []
        for label in self.class_labels:
            tp = fp = total = 0
            for m in self.matches.values():
                for pred in m["pred"][label]:
                    hit = any(
                        g["intersection"]
                        / (g["instance_count"] + pred["instance_count"]
                           - g["intersection"] + 1e-8)
                        > threshold
                        for g in pred["matched_gt"]
                    )
                    tp += int(hit)
                    fp += int(not hit)
                total += len(m["gt"][label])
            pre = tp / (tp + fp + 1e-8)
            rec = tp / (total + 1e-8)
            per[label] = {"precision": pre, "recall": rec,
                          "tp": tp, "fp": fp, "total": total}
            pre_all.append(pre)
            rec_all.append(rec)
        return {
            "precision": float(np.mean(pre_all)) if pre_all else 0.0,
            "recall": float(np.mean(rec_all)) if rec_all else 0.0,
            "classes": per,
        }

    def evaluate(self) -> Dict[str, object]:
        ap = np.zeros((len(self.class_labels), len(OVERLAPS)))
        for oi, ov in enumerate(OVERLAPS):
            pred_visited = {
                p["uid"]: False
                for m in self.matches.values()
                for preds in m["pred"].values()
                for p in preds
            }
            for li, label in enumerate(self.class_labels):
                ap[li, oi] = self._ap_for(label, ov, pred_visited)

        o50 = np.isclose(OVERLAPS, 0.5)
        o25 = np.isclose(OVERLAPS, 0.25)
        main = ~o25
        per_class = {
            label: {
                "ap": float(np.average(ap[li, main])),
                "ap50": float(np.average(ap[li, o50])),
                "ap25": float(np.average(ap[li, o25])),
            }
            for li, label in enumerate(self.class_labels)
        }
        return {
            "all_ap": float(np.nanmean(ap[:, main])),
            "all_ap_50": float(np.nanmean(ap[:, o50])),
            "all_ap_25": float(np.nanmean(ap[:, o25])),
            "classes": per_class,
        }
