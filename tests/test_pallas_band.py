"""Band-merge lookup kernel (interpret mode) vs the merge_lookup oracle."""
import numpy as np
import pytest

import jax.numpy as jnp

from tpu3dwsis.ops import hashgrid
from tpu3dwsis.ops.hashgrid import PAD_KEY
from tpu3dwsis.ops.merge_lookup import merge_lookup
from tpu3dwsis.ops.pallas_band import band_subm_lookup
from tpu3dwsis.ops.rulebook import subm_offsets


def make_keys(m, rng, shape=(64, 64, 64), fill=0.6):
    """Sorted packed voxel keys with a PAD tail (standard level layout)."""
    pts = rng.integers(0, shape[0], size=(int(m * fill * 2), 3))
    keys = np.unique(
        (pts[:, 0] * shape[1] * shape[2] + pts[:, 1] * shape[2] + pts[:, 2]).astype(
            np.int32
        )
    )[: int(m * fill)]
    out = np.full(m, PAD_KEY, np.int32)
    out[: len(keys)] = np.sort(keys)
    return jnp.asarray(out), shape


def neg_half_deltas(shape, max_batch=4):
    strides = np.asarray(hashgrid.coord_strides(shape, max_batch)[1:], np.int64)
    offs = subm_offsets(3)
    half = len(offs) // 2
    deltas = [int((strides * o.astype(np.int64)).sum()) for o in offs[:half]]
    assert all(d < 0 for d in deltas)
    # dx groups of the row-major negative half: 9 offsets at dx=-1, 4 at dx=0
    return tuple(deltas), (9, 4)


@pytest.mark.parametrize("window", [512, 128])
def test_band_matches_merge_lookup(window):
    """window=128 forces many FAR rows through the binary-search fixup."""
    rng = np.random.default_rng(0)
    m = 4096
    keys, shape = make_keys(m, rng)
    deltas, gsizes = neg_half_deltas(shape)

    got = band_subm_lookup(keys, deltas, gsizes, tile=256, window=window,
                           interpret=True)

    real = keys != PAD_KEY
    for k, d in enumerate(deltas):
        pos, found = merge_lookup(keys, keys + jnp.int32(d))
        want = np.where(np.asarray(found & real), np.asarray(pos), m)
        np.testing.assert_array_equal(np.asarray(got[k]), want, err_msg=f"k={k}")


def test_band_pad_tail_all_miss():
    rng = np.random.default_rng(1)
    m = 2048
    keys, shape = make_keys(m, rng, fill=0.4)
    deltas, gsizes = neg_half_deltas(shape)
    got = np.asarray(band_subm_lookup(keys, deltas, gsizes, tile=256,
                                      window=512, interpret=True))
    pad = np.asarray(keys) == PAD_KEY
    assert (got[:, pad] == m).all()
    assert (got <= m).all()  # no FAR sentinel survives the fixup


def test_build_subm_table_band_equals_merge(monkeypatch):
    """The band path through rulebook.build_subm_table must produce the
    identical [27, M] table as the merge_lookup path."""
    from tpu3dwsis.ops import rulebook

    rng = np.random.default_rng(2)
    m = 2048
    shape = (48, 48, 32)
    keys, _ = make_keys(m, rng, shape=shape)
    valid = np.asarray(keys) != PAD_KEY
    coords = np.asarray(
        hashgrid.unpack_coords(jnp.where(jnp.asarray(valid), keys, 0), shape, 4)
    )
    level = rulebook.VoxelLevel(keys, jnp.asarray(coords), jnp.asarray(valid))

    monkeypatch.setattr(rulebook, "_BAND_MODE", "0")
    ref = np.asarray(rulebook.build_subm_table(level, shape, 4))
    monkeypatch.setattr(rulebook, "_BAND_MODE", "interpret")
    got = np.asarray(rulebook.build_subm_table(level, shape, 4))
    np.testing.assert_array_equal(got, ref)
