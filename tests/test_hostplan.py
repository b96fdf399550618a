"""Host-plan collate (data/hostplan.py) must reproduce the device-built plan
bit-exactly: same voxel sets, same level links, same pooled features."""
import numpy as np
import jax.numpy as jnp

from tpu3dwsis.core.buckets import fit_statics
from tpu3dwsis.data.collate import SceneLabels, collate, to_scene_batch
from tpu3dwsis.data.hostplan import pack_coords_np
from tpu3dwsis.data.synthetic import make_scene
from tpu3dwsis.nn.network import preprocess
from tpu3dwsis.ops import hashgrid


def _labels(s):
    return SceneLabels(
        point_sem=s.sem, point_ins=s.ins, sp_sem=s.sp_sem_gt, sp_ins=s.sp_ins_gt,
        sp_offset=s.sp_offset_gt,
        sp_occupancy=np.zeros(s.num_superpoints, np.float32),
        sp_size=np.ones(s.num_superpoints, np.float32),
    )


def test_pack_coords_np_matches_device():
    rng = np.random.default_rng(0)
    coords = np.stack([
        rng.integers(0, 3, 500), rng.integers(-2, 130, 500),
        rng.integers(0, 128, 500), rng.integers(0, 70, 500),
    ], axis=1).astype(np.int32)
    valid = rng.random(500) < 0.9
    got = pack_coords_np(coords, (128, 128, 64), 3, valid=valid)
    want = np.asarray(
        hashgrid.pack_coords(jnp.asarray(coords), (128, 128, 64), 3,
                             valid=jnp.asarray(valid))
    )
    np.testing.assert_array_equal(got, want)


def test_host_plan_matches_device_plan():
    scenes = [make_scene(seed=i) for i in range(2)]
    statics = fit_statics(scenes, batch_size=2, num_levels=3, max_instances=16)
    labels = [_labels(s) for s in scenes]

    r0, r1 = np.random.default_rng(3), np.random.default_rng(3)
    a0 = collate(scenes, labels, statics, r0, training=True)
    a1 = collate(scenes, labels, statics, r1, training=True, host_plan=True)
    b0, b1 = to_scene_batch(a0), to_scene_batch(a1)

    # host-plan points are a permutation of the device-path points
    k0 = np.sort(pack_coords_np(a0["point_coords"], statics.spatial_shape,
                                statics.max_batch, valid=a0["point_valid"]))
    k1 = pack_coords_np(a1["point_coords"], statics.spatial_shape,
                        statics.max_batch, valid=a1["point_valid"])
    np.testing.assert_array_equal(k0, k1)  # already sorted by construction
    assert np.all(np.diff(k1.astype(np.int64)) >= 0)

    p0 = preprocess(b0, statics)
    p1 = preprocess(b1, statics)
    for l0, l1 in zip(p0.plan.levels, p1.plan.levels):
        np.testing.assert_array_equal(np.asarray(l0.level.keys), np.asarray(l1.level.keys))
        np.testing.assert_array_equal(np.asarray(l0.level.valid), np.asarray(l1.level.valid))
        np.testing.assert_array_equal(np.asarray(l0.subm_nbr), np.asarray(l1.subm_nbr))
        if l0.down_nbr is not None:
            np.testing.assert_array_equal(np.asarray(l0.down_nbr), np.asarray(l1.down_nbr))
            np.testing.assert_array_equal(np.asarray(l0.parent), np.asarray(l1.parent))
            np.testing.assert_array_equal(
                np.asarray(l0.child_offset), np.asarray(l1.child_offset)
            )
    np.testing.assert_allclose(
        np.asarray(p0.voxel_feats), np.asarray(p1.voxel_feats), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p0.sp_center), np.asarray(p1.sp_center), rtol=1e-5, atol=1e-5
    )
    # every in-grid point still maps to the voxel holding its own key
    # (augmentation can shift a few valid points outside spatial_shape; those
    # map to the null voxel on BOTH paths — reference crop semantics)
    vk = np.asarray(p1.plan.levels[0].level.keys)
    p2v = np.asarray(p1.p2v)
    pv = np.asarray(b1.point_valid) & (k1 != hashgrid.PAD_KEY)
    assert np.all(p2v[pv] < statics.max_voxels)
    np.testing.assert_array_equal(vk[p2v[pv]], k1[pv])
    np.testing.assert_array_equal(
        np.asarray(p1.p2v)[np.asarray(b1.point_valid) & (k1 == hashgrid.PAD_KEY)],
        statics.max_voxels,
    )


def test_host_plan_overflow_truncation_matches_device():
    """Coarse-capacity overflow must null out the same children on both
    paths (host np.unique truncation == device jnp.unique truncation)."""
    from tpu3dwsis.data.hostplan import build_host_plan
    from tpu3dwsis.ops import rulebook, voxelize

    rng = np.random.default_rng(11)
    coords = np.unique(
        np.stack([np.zeros(600, np.int64), rng.integers(0, 16, 600),
                  rng.integers(0, 16, 600), rng.integers(0, 16, 600)], axis=1),
        axis=0,
    ).astype(np.int32)
    n = len(coords)
    valid = np.ones(n, bool)

    class _St:
        spatial_shape = (16, 16, 16)
        max_batch = 1
        num_levels = 2
        level_sizes = (512, 40)  # 40 coarse slots -> forced overflow

        @property
        def coarse_shapes(self):
            return ((16, 16, 16), (8, 8, 8))

    st = _St()
    hp = build_host_plan(coords, valid, st)
    vox = voxelize.voxelize_coords(jnp.asarray(coords), (16, 16, 16), 1, 512,
                                   valid=jnp.asarray(valid))
    fine = rulebook.VoxelLevel(vox.keys, vox.coords, vox.valid)
    coarse, down_nbr, parent, child_offset = rulebook.build_downsample(
        fine, (16, 16, 16), 1, 40
    )
    np.testing.assert_array_equal(hp["hp_level_keys"][0], np.asarray(coarse.keys))
    np.testing.assert_array_equal(hp["hp_parents"][0], np.asarray(parent))
