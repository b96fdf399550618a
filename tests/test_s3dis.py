"""S3DIS-specific components: coverage metrics, RANSAC planes, post-processing,
block crop, subsampling."""
import numpy as np

from tpu3dwsis.data.s3dis import crop_block, subsample_quarter
from tpu3dwsis.eval.s3dis_cov import S3DISCoverageEvaluator
from tpu3dwsis.infer.planes import get_room_walls, segment_plane


def test_coverage_evaluator_perfect():
    n = 1000
    sem = np.zeros(n, np.int64)
    sem[500:] = 3
    ins = np.zeros(n, np.int64)
    ins[500:] = 1
    masks = np.zeros((2, n), bool)
    masks[0, :500] = True
    masks[1, 500:] = True
    ev = S3DISCoverageEvaluator()
    ev.process(masks, np.array([0, 3]), sem, ins)
    res = ev.evaluate()
    assert res["mCov"] == 1.0 and res["mWCov"] == 1.0
    assert res["mPrec"] == 1.0 and res["mRec"] == 1.0


def test_coverage_evaluator_partial():
    n = 1000
    sem = np.zeros(n, np.int64)
    ins = np.zeros(n, np.int64)
    # one gt instance, one pred covering 60% of it and nothing else
    masks = np.zeros((1, n), bool)
    masks[0, :600] = True
    ev = S3DISCoverageEvaluator()
    ev.process(masks, np.array([0]), sem, ins)
    res = ev.evaluate()
    np.testing.assert_allclose(res["mCov"], 0.6, rtol=1e-6)
    assert res["mPrec"] == 1.0  # IoU 0.6 > 0.5


def test_segment_plane_finds_dominant_plane():
    rng = np.random.default_rng(0)
    plane_pts = np.column_stack(
        [rng.uniform(0, 5, 2000), rng.uniform(0, 5, 2000), rng.normal(0, 0.01, 2000)]
    )
    noise = rng.uniform(0, 5, (300, 3))
    xyz = np.concatenate([plane_pts, noise])
    plane, inliers = segment_plane(xyz, distance=0.05)
    # most inliers are the z=0 plane points
    assert (inliers < 2000).mean() > 0.9
    assert abs(abs(plane[2]) - 1.0) < 0.05  # normal ≈ ±z


def test_get_room_walls_splits_two_walls():
    rng = np.random.default_rng(1)
    w1 = np.column_stack(
        [rng.uniform(0, 6, 12000), np.full(12000, 0.0) + rng.normal(0, 0.01, 12000), rng.uniform(0, 3, 12000)]
    )
    w2 = np.column_stack(
        [np.full(12000, 0.0) + rng.normal(0, 0.01, 12000), rng.uniform(0, 6, 12000), rng.uniform(0, 3, 12000)]
    )
    xyz = np.concatenate([w1, w2])
    walls = get_room_walls(xyz, np.ones(len(xyz), bool), min_points=5000)
    assert len(walls) >= 2
    # first two planes separate the two walls
    first = walls[0]
    frac_w1 = first[:12000].sum() / first.sum()
    assert frac_w1 > 0.95 or frac_w1 < 0.05


def test_crop_block_and_subsample():
    rng = np.random.default_rng(2)
    xyz = rng.uniform(0, 100, (5000, 3))
    keep = crop_block(xyz, rng, max_npoint=1000)
    assert keep.sum() <= 1000
    assert keep.sum() > 0
    sub = subsample_quarter(4000, rng)
    assert len(sub) == 1000 and len(np.unique(sub)) == 1000
