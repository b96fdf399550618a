"""Auto bucket sizing covers the measured dataset with margin."""
import numpy as np

from tpu3dwsis.core.buckets import fit_statics
from tpu3dwsis.data.collate import SceneLabels, collate
from tpu3dwsis.data.synthetic import make_scene


def test_fit_statics_covers_worst_batch():
    scenes = [
        make_scene(seed=s, num_instances=3 + s % 3, points_per_instance=100, num_background=300 + 50 * s)
        for s in range(5)
    ]
    statics = fit_statics(scenes, batch_size=2, num_levels=2, max_instances=16)
    assert statics.max_points >= 2 * max(s.num_points for s in scenes)
    assert statics.max_superpoints >= 2 * max(s.num_superpoints for s in scenes)
    assert statics.level_sizes[0] == statics.max_voxels

    # the worst pair must collate without overflow
    worst = sorted(scenes, key=lambda s: s.num_points)[-2:]
    labels = [
        SceneLabels(s.sem, s.ins, s.sp_sem_gt, s.sp_ins_gt, s.sp_offset_gt) for s in worst
    ]
    collate(worst, labels, statics, np.random.default_rng(0), training=False)


def test_collate_overflow_recrops_instead_of_raising():
    """An outlier scene bigger than the bucket must train through: collate
    re-crops it tighter (or drops it) instead of killing the run
    (VERDICT r1 weak #5)."""
    import pytest

    small = make_scene(seed=0, num_instances=3, points_per_instance=100, num_background=300)
    outlier = make_scene(seed=1, num_instances=6, points_per_instance=600, num_background=2000)
    statics = fit_statics([small], batch_size=2, num_levels=2, max_instances=16)
    labels = [
        SceneLabels(s.sem, s.ins, s.sp_sem_gt, s.sp_ins_gt, s.sp_offset_gt)
        for s in (small, outlier)
    ]
    rng = np.random.default_rng(0)
    out = collate([small, outlier], labels, statics, rng, training=True)
    # the small scene survived intact; the outlier was cropped (or dropped)
    offs = out["_point_offsets"]
    assert offs[1] == small.num_points
    assert out["point_valid"].sum() <= statics.max_points
    assert out["sp_valid"].sum() <= statics.max_superpoints
    # eval mode must still refuse (silent cropping would corrupt metrics)
    with pytest.raises(ValueError):
        collate([outlier], labels[1:], statics, rng, training=False)


def test_auto_buckets_via_cli_config(tmp_path):
    cfg_path = tmp_path / "auto.yaml"
    cfg_path.write_text(
        """
_base_: /root/repo/configs/synthetic_smoke.yaml
buckets: auto
"""
    )
    from tpu3dwsis.train.cli import build_world
    from tpu3dwsis.utils.config import Config

    cfg = Config.fromfile(str(cfg_path))
    model, statics, train_ds, val_ds, tcfg = build_world(cfg)
    assert statics.max_points > 0 and statics.max_voxels >= 4096
    # collate a real batch under the measured bucket
    train_ds.collate_batch([0, 1], np.random.default_rng(0), training=True)
