"""Pallas fused subm conv vs the XLA gather path (interpret mode on CPU)."""
import numpy as np

import jax.numpy as jnp

from tpu3dwsis.ops import rulebook, sparse_conv, voxelize
from tpu3dwsis.ops.pallas_spconv import build_pos_tables, max_window_span, subm_conv_pallas


def test_pallas_subm_conv_matches_xla():
    rng = np.random.default_rng(0)
    shape, batch, cin, cout = (16, 16, 16), 2, 32, 32
    n = 1200
    coords = np.concatenate(
        [rng.integers(0, batch, (n, 1)), rng.integers(0, 16, (n, 3))], axis=1
    ).astype(np.int32)
    m_pad = 1024
    vox = voxelize.voxelize_coords(jnp.asarray(coords), shape, batch, m_pad)
    level = rulebook.VoxelLevel(vox.keys, vox.coords, vox.valid)
    nbr = rulebook.build_subm_table(level, shape, batch)
    pos, found = build_pos_tables(level, shape, batch)

    # table consistency: where found, pos equals the folded nbr table
    nbr_np, pos_np, found_np = np.asarray(nbr), np.asarray(pos), np.asarray(found)
    np.testing.assert_array_equal(pos_np[found_np], nbr_np[found_np])
    # monotone positions per offset
    assert (np.diff(pos_np, axis=1) >= 0).all()

    feats = np.zeros((m_pad, cin), np.float32)
    mvalid = int(vox.num_voxels)
    feats[:mvalid] = rng.standard_normal((mvalid, cin)).astype(np.float32)
    w = rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2

    want = np.asarray(sparse_conv.gather_conv(jnp.asarray(feats), nbr, jnp.asarray(w)))

    span = int(max_window_span(pos, tile=128, channels=cin))
    p = 128 // cin
    window = int(max(256, 128 * p, 1 << int(np.ceil(np.log2(span)))))
    feats_null = np.concatenate([feats, np.zeros((1, cin), np.float32)])
    for mode in ("onehot", "dynamic"):
        got = np.asarray(
            subm_conv_pallas(
                jnp.asarray(feats_null), pos, found, jnp.asarray(w),
                tile=128, window=window, interpret=True, gather_mode=mode,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4, err_msg=mode)
