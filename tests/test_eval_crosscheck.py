"""Cross-validate our evaluators against the REFERENCE's own numpy
evaluators on identical predictions/GT (VERDICT round-1 item #7).

``evaluation/basic/ins_seg_evaluator.py`` and ``utils/eval_s3dis.py`` are
pure numpy and directly importable; we load them from /root/reference with
shims for removed numpy aliases (np.float/np.bool) and the gorilla-lab
``utils`` table helpers, then assert equal AP / coverage numbers on a
randomized fixture that exercises the edge cases: duplicate matches on one
GT, void ignores, small-GT ignores, wrong-class predictions, classes with
GT but no predictions.
"""
import importlib
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

CLASS_IDS = [3, 5, 9]
CLASS_LABELS = ["chair", "table", "sofa"]


@pytest.fixture(scope="module")
def ref_modules():
    if not os.path.isdir(os.path.join(REF, "evaluation", "basic")):
        pytest.skip("reference checkout unavailable")
    # removed numpy aliases used by the 2021-era reference.  Use numpy
    # scalar types, NOT python builtins: `np.bool = bool` breaks
    # numpy.testing internals in tests that run later in the session
    # (assert_allclose does `np.bool(...).all()`).  Restore the originals
    # afterwards (numpy 2.x has a real np.bool again).
    saved = {a: getattr(np, a, None) for a in ("float", "bool")}
    np.float = np.float64  # noqa: NPY001
    np.bool = np.bool_  # noqa: NPY001
    if "utils" not in sys.modules:
        stub = types.ModuleType("utils")
        stub.table = lambda *a, **k: ""
        stub.create_small_table = lambda *a, **k: ""
        stub.track = lambda tasks, **k: tasks
        sys.modules["utils"] = stub
    pkg = types.ModuleType("refbasic")
    pkg.__path__ = [os.path.join(REF, "evaluation", "basic")]
    sys.modules.setdefault("refbasic", pkg)
    ins_mod = importlib.import_module("refbasic.ins_seg_evaluator")

    spec = importlib.util.spec_from_file_location(
        "ref_eval_s3dis", os.path.join(REF, "utils", "eval_s3dis.py")
    )
    s3dis_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(s3dis_mod)
    yield ins_mod.InstanceEvaluator, s3dis_mod.S3DIS_Instance_evaluator
    for alias, orig in saved.items():  # un-shim numpy for the session
        if orig is None:
            if hasattr(np, alias):
                delattr(np, alias)
        else:
            setattr(np, alias, orig)


def _make_fixture(seed, n_points=4000, n_inst=10, class_ids=CLASS_IDS):
    """Random GT + noisy predictions for one scene."""
    rng = np.random.default_rng(seed)
    gt_ids = np.zeros(n_points, np.int64)  # 0 = unannotated (void)
    cursor = 0
    insts = []
    for k in range(n_inst):
        size = int(rng.integers(40, 420))  # some below MIN_REGION_SIZE=100
        if cursor + size > n_points - 400:
            break
        cid = int(rng.choice(class_ids + [1]))  # class 1 = out-of-eval (void)
        gt_ids[cursor : cursor + size] = cid * 1000 + k + 1
        insts.append((cursor, size, cid, k))
        cursor += size

    masks, labels, confs = [], [], []
    for cursor, size, cid, k in insts:
        n_dup = 1 + int(rng.random() < 0.35)  # sometimes a duplicate match
        for _ in range(n_dup):
            m = np.zeros(n_points, bool)
            lo = max(0, cursor - int(rng.integers(0, 40)))
            hi = min(n_points, cursor + size + int(rng.integers(0, 60)))
            m[lo:hi] = True
            drop = rng.random(hi - lo) < 0.15
            m[lo:hi] &= ~drop
            pred_cid = cid if rng.random() < 0.8 else int(rng.choice(class_ids))
            masks.append(m)
            labels.append(pred_cid)
            confs.append(float(rng.random()))
    # a few pure-noise predictions (FP / void-ignore paths)
    for _ in range(4):
        m = np.zeros(n_points, bool)
        st = int(rng.integers(0, n_points - 300))
        m[st : st + int(rng.integers(60, 300))] = True
        masks.append(m)
        labels.append(int(rng.choice(class_ids)))
        confs.append(float(rng.random()))
    return (
        np.stack(masks),
        np.asarray(labels, np.int64),
        np.asarray(confs, np.float64),
        gt_ids,
    )


def test_instance_ap_matches_reference(ref_modules):
    RefInstanceEvaluator, _ = ref_modules
    from tpu3dwsis.eval.instance_ap import InstanceAPEvaluator

    ref = RefInstanceEvaluator(class_labels=CLASS_LABELS, class_ids=CLASS_IDS)
    ours = InstanceAPEvaluator(CLASS_IDS, CLASS_LABELS)
    for s in range(4):
        masks, labels, confs, gt_ids = _make_fixture(seed=100 + s)
        ref.assign(
            f"scene{s}",
            {"label_id": labels, "conf": confs, "mask": masks.astype(np.int64)},
            gt_ids,
        )
        ours.process(f"scene{s}", masks, labels, confs, gt_ids)

    ref.evaluate_matches()
    res = ours.evaluate()
    assert np.allclose(res["all_ap"], float(ref.avgs["all_ap"]), atol=1e-9, equal_nan=True)
    assert np.allclose(res["all_ap_50"], float(ref.avgs["all_ap_50%"]), atol=1e-9, equal_nan=True)
    assert np.allclose(res["all_ap_25"], float(ref.avgs["all_ap_25%"]), atol=1e-9, equal_nan=True)
    for label in CLASS_LABELS:
        for ok, rk in (("ap", "ap"), ("ap50", "ap50%"), ("ap25", "ap25%")):
            a = res["classes"][label][ok]
            b = float(ref.avgs["classes"][label][rk])
            assert np.allclose(a, b, atol=1e-9, equal_nan=True), (label, ok, a, b)


def test_s3dis_coverage_matches_reference(ref_modules):
    _, RefS3DIS = ref_modules
    from tpu3dwsis.eval.s3dis_cov import S3DISCoverageEvaluator

    rng = np.random.default_rng(0)
    num_classes = 13
    ref = RefS3DIS(logger=types.SimpleNamespace(info=lambda *a, **k: None))
    ours = S3DISCoverageEvaluator(num_classes=num_classes)

    for s in range(3):
        n = 3000
        # every class gets GT across the scenes; instances are segments
        ins_gt = np.zeros(n, np.int64)
        sem_gt = np.zeros(n, np.int64)
        cursor = 0
        k = 0
        while cursor < n - 200:
            size = int(rng.integers(80, 300))
            c = (k + s * 4) % num_classes
            ins_gt[cursor : cursor + size] = k + 1
            sem_gt[cursor : cursor + size] = c
            cursor += size
            k += 1
        masks, sems = [], []
        for ins_id in np.unique(ins_gt):
            if rng.random() < 0.15:
                continue
            m = ins_gt == ins_id
            idx = np.where(m)[0]
            m = m.copy()
            m[idx[rng.random(len(idx)) < 0.2]] = False
            if not m.any():
                continue
            masks.append(m)
            c = int(np.bincount(sem_gt[ins_gt == ins_id]).argmax())
            sems.append(c if rng.random() < 0.85 else int(rng.integers(0, num_classes)))
        masks = np.stack(masks)
        sems = np.asarray(sems, np.int64)
        ref.process(
            {"conf": np.ones(len(sems)), "sem_label": sems + 1, "mask": masks.astype(np.int64)},
            {"sem_gt": sem_gt, "ins_gt": ins_gt},
        )
        ours.process(masks, sems, sem_gt, ins_gt)

    res = ours.evaluate()
    # reference logs instead of returning; recompute its headline means from
    # its accumulated state with its own formulas (eval_s3dis.py:116-157)
    mucov = np.mean([np.mean(c) for c in ref.all_mean_cov if c])
    mwcov = np.mean([np.mean(c) for c in ref.all_mean_weighted_cov if c])
    prec, rec = [], []
    for c in range(num_classes):
        tp = float(np.sum(ref.ins_tp_num[c]))
        fp = float(np.sum(ref.ins_fp_num[c]))
        prec.append(tp / (tp + fp) if tp + fp else np.nan)
        rec.append(tp / ref.total_gt_ins[c] if ref.total_gt_ins[c] else np.nan)
    assert np.allclose(res["mCov"], mucov, atol=1e-9)
    assert np.allclose(res["mWCov"], mwcov, atol=1e-9)
    assert np.allclose(res["mPrec"], np.nanmean(prec), atol=1e-9)
    assert np.allclose(res["mRec"], np.nanmean(rec), atol=1e-9)


def test_prec_recall_matches_reference(ref_modules):
    """print_prec_recall parity: capture the rows the reference hands to its
    table printer and compare with our intersection-derived prec_recall()."""
    RefInstanceEvaluator, _ = ref_modules
    from tpu3dwsis.eval.instance_ap import InstanceAPEvaluator

    ref = RefInstanceEvaluator(class_labels=CLASS_LABELS, class_ids=CLASS_IDS)
    ours = InstanceAPEvaluator(CLASS_IDS, CLASS_LABELS)
    for s in range(4):
        masks, labels, confs, gt_ids = _make_fixture(seed=200 + s)
        ref.assign(
            f"scene{s}",
            {"label_id": labels, "conf": confs, "mask": masks.astype(np.int64)},
            gt_ids,
        )
        ours.process(f"scene{s}", masks, labels, confs, gt_ids)

    captured = {}
    utils_stub = sys.modules["utils"]
    orig_table = utils_stub.table

    def capture_table(rows, **kwargs):
        captured.setdefault("rows", rows)
        return ""

    utils_stub.table = capture_table
    import logging

    ref.logger = logging.getLogger("ref_prec_recall_crosscheck")
    try:
        ref.print_prec_recall(threshold=0.5)
    finally:
        utils_stub.table = orig_table

    res = ours.prec_recall(0.5)
    assert "rows" in captured and len(captured["rows"]) == len(CLASS_LABELS)
    for label_padded, pre, rec in captured["rows"]:
        label = label_padded.strip()
        assert np.allclose(res["classes"][label]["precision"], pre, atol=1e-9), label
        assert np.allclose(res["classes"][label]["recall"], rec, atol=1e-9), label
