"""Numpy-oracle tests for segment ops, key packing, and voxelization."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dwsis.ops import hashgrid, segment, voxelize
from tpu3dwsis.ops.hashgrid import PAD_KEY


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    shape = (64, 48, 32)
    coords = np.stack(
        [
            rng.integers(0, 4, 100),
            rng.integers(0, 64, 100),
            rng.integers(0, 48, 100),
            rng.integers(0, 32, 100),
        ],
        axis=1,
    ).astype(np.int32)
    keys = hashgrid.pack_coords(jnp.asarray(coords), shape, max_batch=4)
    back = hashgrid.unpack_coords(keys, shape, max_batch=4)
    np.testing.assert_array_equal(np.asarray(back), coords)


def test_pack_out_of_range_is_pad():
    shape = (8, 8, 8)
    coords = jnp.asarray([[0, -1, 0, 0], [0, 8, 0, 0], [4, 0, 0, 0], [0, 1, 2, 3]], jnp.int32)
    keys = hashgrid.pack_coords(coords, shape, max_batch=4)
    k = np.asarray(keys)
    assert k[0] == PAD_KEY and k[1] == PAD_KEY and k[2] == PAD_KEY
    assert k[3] != PAD_KEY


def test_lookup_hit_and_miss():
    table = jnp.asarray(sorted([5, 9, 17, 100]) + [int(PAD_KEY)] * 4, jnp.int32)
    q = jnp.asarray([5, 6, 100, int(PAD_KEY)], jnp.int32)
    pos, found = hashgrid.lookup(table, q)
    assert list(np.asarray(found)) == [True, False, True, False]
    assert np.asarray(pos)[0] == 0 and np.asarray(pos)[2] == 3


def test_segment_ops_against_numpy():
    rng = np.random.default_rng(1)
    n, s = 257, 19
    data = rng.standard_normal((n, 5)).astype(np.float32)
    ids = rng.integers(0, s, n).astype(np.int32)
    got_sum = np.asarray(segment.segment_sum(jnp.asarray(data), jnp.asarray(ids), s))
    got_mean = np.asarray(segment.segment_mean(jnp.asarray(data), jnp.asarray(ids), s))
    for j in range(s):
        rows = data[ids == j]
        np.testing.assert_allclose(got_sum[j], rows.sum(0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got_mean[j], rows.mean(0), rtol=1e-5, atol=1e-5)


def test_segment_argmax_and_softmax():
    data = jnp.asarray([1.0, 5.0, 3.0, 2.0, 2.0, -1.0])
    ids = jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32)
    am = np.asarray(segment.segment_argmax(data, ids, 3))
    assert am[0] == 1 and am[1] == 3  # ties -> first index
    assert am[2] == 6  # empty segment sentinel
    sm = np.asarray(segment.segment_softmax(data, ids, 3))
    np.testing.assert_allclose(sm[:3].sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(sm[3:].sum(), 1.0, rtol=1e-6)
    ref = np.exp([1.0, 5.0, 3.0]) / np.exp([1.0, 5.0, 3.0]).sum()
    np.testing.assert_allclose(sm[:3], ref, rtol=1e-5)


def test_voxelize_matches_numpy_unique():
    rng = np.random.default_rng(2)
    n = 500
    shape = (32, 32, 32)
    coords = np.concatenate(
        [rng.integers(0, 2, (n, 1)), rng.integers(0, 32, (n, 3))], axis=1
    ).astype(np.int32)
    valid = rng.random(n) < 0.9
    feats = rng.standard_normal((n, 6)).astype(np.float32)

    m_pad = 512
    vox = voxelize.voxelize_coords(
        jnp.asarray(coords), shape, max_batch=2, max_voxels=m_pad, valid=jnp.asarray(valid)
    )
    # numpy oracle
    key = ((coords[:, 0] * 32 + coords[:, 1]) * 32 + coords[:, 2]) * 32 + coords[:, 3]
    uniq = np.unique(key[valid])
    assert int(vox.num_voxels) == len(uniq)
    np.testing.assert_array_equal(np.asarray(vox.keys)[: len(uniq)], uniq)

    # p2v correctness: valid points map to the row holding their key
    p2v = np.asarray(vox.p2v)
    keys_tab = np.asarray(vox.keys)
    for i in range(n):
        if valid[i]:
            assert keys_tab[p2v[i]] == key[i]
        else:
            assert p2v[i] == m_pad

    # mean pooling oracle
    pooled = np.asarray(voxelize.voxel_mean_pool(jnp.asarray(feats), vox.p2v, m_pad))
    for j, k in enumerate(uniq):
        rows = feats[valid & (key == k)]
        np.testing.assert_allclose(pooled[j], rows.mean(0), rtol=1e-5, atol=1e-5)


def test_count_occupied_voxels():
    # group 0 occupies 3 distinct voxels (one duplicated), group 1 occupies 1.
    coords = np.array(
        [[0, 1, 1, 1], [0, 1, 1, 1], [0, 2, 1, 1], [0, 3, 3, 3], [0, 5, 5, 5], [0, 5, 5, 5]],
        dtype=np.int32,
    )
    groups = np.array([0, 0, 0, 0, 1, 1], dtype=np.int32)
    out = voxelize.count_occupied_voxels(
        jnp.asarray(coords), jnp.asarray(groups), 2, (8, 8, 8)
    )
    np.testing.assert_array_equal(np.asarray(out), [3.0, 1.0])


def test_eight_virtual_devices():
    assert jax.device_count() == 8
