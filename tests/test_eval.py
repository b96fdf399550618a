"""Evaluator protocol tests on constructed fixtures."""
import numpy as np

from tpu3dwsis.eval.instance_ap import InstanceAPEvaluator, encode_gt_instances
from tpu3dwsis.eval.semantic import SemanticEvaluator


def test_semantic_evaluator_perfect_and_half():
    ev = SemanticEvaluator(["a", "b", "c"])
    gt = np.array([0, 0, 1, 1, 2, 2, -100])
    ev.process(gt.copy(), gt)
    res = ev.evaluate()
    assert res["miou"] == 1.0 and res["acc"] == 1.0

    ev.reset()
    pred = np.array([0, 1, 1, 1, 2, 0, 0])
    ev.process(pred, gt)
    res = ev.evaluate()
    # class a: tp=1 fp=1 fn=1 -> 1/3; class b: tp=2 fp=1 fn=0 -> 2/3; c: tp=1 fp=0 fn=1 -> 1/2
    np.testing.assert_allclose(res["miou"], (1 / 3 + 2 / 3 + 1 / 2) / 3, rtol=1e-6)


def _make_gt(n, segments):
    """segments: list of (start, end, sem_id, inst_idx)."""
    sem = np.zeros(n, np.int64)
    ins = np.full(n, -100, np.int64)
    for s, e, sid, ii in segments:
        sem[s:e] = sid
        ins[s:e] = ii
    return encode_gt_instances(sem, ins)


def test_instance_ap_perfect_prediction():
    n = 1000
    gt = _make_gt(n, [(0, 400, 5, 0), (400, 1000, 7, 1)])
    ev = InstanceAPEvaluator([5, 7], ["chair", "table"])
    masks = np.zeros((2, n), bool)
    masks[0, :400] = True
    masks[1, 400:] = True
    ev.process("scene0", masks, np.array([5, 7]), np.array([0.9, 0.8]), gt)
    res = ev.evaluate()
    assert res["all_ap"] == 1.0 and res["all_ap_50"] == 1.0 and res["all_ap_25"] == 1.0


def test_instance_ap_partial_overlap():
    n = 1000
    gt = _make_gt(n, [(0, 400, 5, 0)])
    ev = InstanceAPEvaluator([5, 7], ["chair", "table"])
    # prediction covers 240/400 of gt plus 160 extra -> IoU = 240/560 ≈ 0.43
    mask = np.zeros((1, n), bool)
    mask[0, 160:560] = True
    mask[0, :100] = False
    mask[0, 160:400] = True
    ev.process("scene0", mask, np.array([5]), np.array([0.9]), gt)
    res = ev.evaluate()
    # matched at 0.25 overlap but not at 0.5 -> ap25=1, ap50=0
    assert res["all_ap_25"] == 1.0
    assert res["all_ap_50"] == 0.0
    assert res["classes"]["table"]["ap"] != res["classes"]["table"]["ap"]  # nan: no gt


def test_instance_ap_small_region_and_void_ignored():
    n = 1000
    gt = _make_gt(n, [(0, 50, 5, 0)])  # gt smaller than MIN_REGION_SIZE
    ev = InstanceAPEvaluator([5], ["chair"])
    # pred entirely on void region (unannotated) -> should be ignored, not FP
    mask = np.zeros((1, n), bool)
    mask[0, 500:800] = True
    ev.process("scene0", mask, np.array([5]), np.array([0.9]), gt)
    res = ev.evaluate()
    # no valid gt at all -> nan
    assert res["all_ap"] != res["all_ap"]


def test_instance_ap_duplicate_predictions_penalized():
    n = 2000
    gt = _make_gt(n, [(0, 1000, 5, 0), (1000, 2000, 5, 1)])
    ev = InstanceAPEvaluator([5], ["chair"])
    # three predictions: two duplicates on gt0 (one lower conf), one on gt1
    masks = np.zeros((3, n), bool)
    masks[0, :1000] = True
    masks[1, :1000] = True
    masks[2, 1000:] = True
    # duplicate (conf 0.85) ranks above gt1's match (0.8) -> real FP in the curve
    ev.process("s", masks, np.array([5, 5, 5]), np.array([0.9, 0.85, 0.8]), gt)
    res = ev.evaluate()
    np.testing.assert_allclose(
        res["all_ap_50"], 2 / 3 * 0.25 + 0.5 * 0.25 + 1 * 0.25 + 1 * 0.25, rtol=1e-6
    )
