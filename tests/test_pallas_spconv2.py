"""Kernel v2 (windowed-DMA subm conv) vs the XLA oracle, interpret mode.

Covers: misses, window-exceeding far rows (plane jumps / scene boundaries),
C=32 (p=4) and C=64 (p=2), forward and the fused dx+dW backward.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu3dwsis.ops.pallas_spconv2 import subm_conv_bwd, subm_conv_fwd
from tpu3dwsis.ops.sparse_conv import gather_conv


def make_tables(m, k, rng, plane=3000, miss_rate=0.35):
    """Monotone-ish neighbor tables with near-diagonal and plane-shift
    offsets plus occasional large jumps (window busters)."""
    nbr = np.empty((k, m), np.int32)
    base = np.arange(m, dtype=np.int64)
    offs = [0, 1, -1, 57, -57, plane, -plane]
    for kk in range(k):
        v = base + offs[kk % len(offs)] + rng.integers(-4, 5, m)
        # inject a few big jumps to exercise the far path
        jump_at = rng.integers(0, m, 5)
        for j in jump_at:
            v[j] = rng.integers(0, m)
        miss = rng.random(m) < miss_rate
        v = np.where((v < 0) | (v >= m) | miss, m, v)
        # per-offset table must be the positions of a sorted-key match:
        # sort the hit values to restore monotonicity, keep misses in place
        hit_vals = np.sort(v[v < m])
        out = np.full(m, m, np.int32)
        out[np.sort(np.flatnonzero(v < m))] = hit_vals
        nbr[kk] = out
    return jnp.asarray(nbr)


@pytest.mark.parametrize(
    "c,tile,window",
    [(32, 256, 1024), (64, 128, 512), (96, 256, 512), (160, 128, 512)],
)
def test_fwd_matches_oracle(c, tile, window):
    rng = np.random.default_rng(0)
    m, k = 4096, 27
    nbr = make_tables(m, k, rng)
    feats = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32) * 0.2)
    ref = gather_conv(feats, nbr, w)
    out = subm_conv_fwd(feats, nbr, w, tile=tile, window=window, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def real_table(m, rng, shape=(64, 64, 64)):
    """A genuine rulebook table (the shared-gather backward symmetry
    dx = Σ gather(g, nbr[k]) @ W[K-1-k]^T requires nbr[K-1-k] to invert
    nbr[k] — true of real submanifold tables, not of random ones)."""
    from tpu3dwsis.ops import hashgrid
    from tpu3dwsis.ops.rulebook import VoxelLevel, build_subm_table

    pts = rng.integers(0, shape[0], size=(m * 2, 3))
    coords = np.concatenate([np.zeros((len(pts), 1), np.int64), pts], axis=1)
    keys = np.unique(
        (coords[:, 1] * shape[1] * shape[2] + coords[:, 2] * shape[2] + coords[:, 3])
        .astype(np.int32)
    )[: m - 1]
    keys_pad = np.full(m, hashgrid.PAD_KEY, np.int32)
    keys_pad[: len(keys)] = np.sort(keys)
    valid = keys_pad != hashgrid.PAD_KEY
    cc = np.asarray(
        hashgrid.unpack_coords(jnp.where(valid, keys_pad, 0), shape, 1)
    )
    level = VoxelLevel(jnp.asarray(keys_pad), jnp.asarray(cc), jnp.asarray(valid))
    return build_subm_table(level, shape, 1)


def test_bwd_matches_autodiff():
    rng = np.random.default_rng(1)
    m, c = 2048, 32
    nbr = real_table(m, rng)
    feats = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((27, c, c)).astype(np.float32) * 0.2)
    g = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))

    def loss(feats, w):
        return jnp.sum(gather_conv(feats, nbr, w) * g)

    dx_ref, dw_ref = jax.grad(loss, argnums=(0, 1))(feats, w)
    dx, dw = subm_conv_bwd(feats, g, nbr, w, tile=256, window=1024, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("c", [96, 160])
def test_bwd_unpacked_channels(c):
    """96/160-channel levels (p=1, unpacked windows) through the fused
    backward — the reference ladder's L2/L4 widths
    (``modules/model/backbone_3D_WSIS.py:49-50``)."""
    rng = np.random.default_rng(6)
    m = 1024
    nbr = real_table(m, rng, shape=(32, 32, 32))
    feats = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((27, c, c)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))

    def loss(feats, w):
        return jnp.sum(gather_conv(feats, nbr, w) * g)

    dx_ref, dw_ref = jax.grad(loss, argnums=(0, 1))(feats, w)
    dx, dw = subm_conv_bwd(feats, g, nbr, w, tile=128, window=512, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=2e-4, atol=2e-4)


def test_bwd_rect_channels():
    """64→32 tail-conv shape: Cin != Cout through the fused backward."""
    rng = np.random.default_rng(3)
    m, cin, cout = 1024, 64, 32
    nbr = real_table(m, rng, shape=(32, 32, 32))
    feats = jnp.asarray(rng.standard_normal((m, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    g = jnp.asarray(rng.standard_normal((m, cout)).astype(np.float32))

    def loss(feats, w):
        return jnp.sum(gather_conv(feats, nbr, w) * g)

    dx_ref, dw_ref = jax.grad(loss, argnums=(0, 1))(feats, w)
    dx, dw = subm_conv_bwd(feats, g, nbr, w, tile=128, window=512, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=2e-4, atol=2e-4)


def test_fwd_down_table_k8_rect():
    """k2s2 down-conv shape: K=8, gather source (fine) bigger than the
    output table (coarse), Cin=32 -> Cout=96 (non-128-divisible output is
    fine — only the gather side packs)."""
    rng = np.random.default_rng(4)
    m_fine, m_coarse, cin, cout = 4096, 1024, 32, 96
    nbr_np = np.full((8, m_coarse), m_fine, np.int32)
    for k in range(8):
        hits = np.sort(rng.choice(m_fine, m_coarse // 2, replace=False))
        rows = np.sort(rng.choice(m_coarse, m_coarse // 2, replace=False))
        col = np.full(m_coarse, m_fine, np.int32)
        col[rows] = hits
        nbr_np[k] = col
    nbr = jnp.asarray(nbr_np)
    feats = jnp.asarray(rng.standard_normal((m_fine, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((8, cin, cout)).astype(np.float32) * 0.2)
    ref = gather_conv(feats, nbr, w)
    out = subm_conv_fwd(feats, nbr, w, tile=256, window=1024, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_table_weight_grad():
    from tpu3dwsis.ops.pallas_spconv2 import table_weight_grad

    rng = np.random.default_rng(5)
    m_fine, m_coarse, cs, ct = 2048, 512, 64, 96
    nbr_np = np.full((8, m_coarse), m_fine, np.int32)
    for k in range(8):
        hits = np.sort(rng.choice(m_fine, m_coarse - 100, replace=False))
        rows = np.sort(rng.choice(m_coarse, m_coarse - 100, replace=False))
        col = np.full(m_coarse, m_fine, np.int32)
        col[rows] = hits
        nbr_np[k] = col
    nbr = jnp.asarray(nbr_np)
    src = jnp.asarray(rng.standard_normal((m_fine, cs)).astype(np.float32))
    tile_side = jnp.asarray(rng.standard_normal((m_coarse, ct)).astype(np.float32))
    got = table_weight_grad(src, tile_side, nbr, tile=128, window=512, interpret=True)
    src_null = jnp.concatenate([src, jnp.zeros((1, cs))])
    ref = jnp.stack(
        [tile_side.T @ src_null[nbr[k]] for k in range(8)]
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fwd_bf16_small_window_forces_far_path():
    """A tiny window forces many rows through the far correction — exactness
    must not depend on the window covering the span."""
    rng = np.random.default_rng(2)
    m, k, c = 1024, 27, 32
    nbr = make_tables(m, k, rng, plane=400, miss_rate=0.2)
    feats = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32) * 0.2).astype(jnp.bfloat16)
    ref = gather_conv(feats, nbr, w)
    out = subm_conv_fwd(feats, nbr, w, tile=128, window=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_far_correction_overflow_runs_extra_rounds():
    """More far rows than one correction batch (n_far > cap): _far_rounds
    must keep iterating instead of silently dropping contributions."""
    from tpu3dwsis.ops.pallas_spconv2 import _group_offsets, _plan_windows, derive_pos

    rng = np.random.default_rng(7)
    m, k, c = 2048, 27, 32
    tile, window = 128, 256
    # monotone tables advancing ~4 source rows per output row: each 128-row
    # tile spans ~512 source rows, so over half the hits fall past a
    # 256-row window -> n_far ~ k*m/2 >> cap (= max(4096, m//32) = 4096)
    base = 4 * np.arange(m, dtype=np.int64)
    nbr_np = np.empty((k, m), np.int32)
    for kk in range(k):
        v = base + kk
        nbr_np[kk] = np.where(v >= m, m, v)
    nbr = jnp.asarray(nbr_np)

    p = 128 // c
    pos, ok = derive_pos(nbr, m)
    mp = -(-m // p) * p
    _, far = _plan_windows(pos, ok, tile, window, p, mp, group_size=_group_offsets(k))
    n_far = int(np.asarray(far).sum())
    assert n_far > 4096, f"construction failed to overflow: n_far={n_far}"

    feats = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32) * 0.2)
    ref = gather_conv(feats, nbr, w)
    out = subm_conv_fwd(feats, nbr, w, tile=tile, window=window, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

    from tpu3dwsis.ops.pallas_spconv2 import table_weight_grad

    tile_side = jnp.asarray(rng.standard_normal((m, 64)).astype(np.float32))
    got = table_weight_grad(feats, tile_side, nbr, tile=tile, window=window, interpret=True)
    feats_null = jnp.concatenate([feats, jnp.zeros((1, c))])
    refw = jnp.stack([tile_side.T @ feats_null[nbr[kk]] for kk in range(k)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(refw), rtol=2e-4, atol=2e-4)


def test_pad_tail_skip_exact():
    """Batch buckets pad tables to capacity with a trailing all-miss run;
    the kernels skip those tiles (_active_rows) and must still be exact —
    including zeros on the padding rows and a correct dW."""
    from tpu3dwsis.ops.pallas_spconv2 import _active_rows

    rng = np.random.default_rng(8)
    m, c = 2048, 32
    nbr_np = np.array(real_table(m, rng, shape=(24, 24, 24)))  # writable copy
    # force a ~45% padding tail: every row >= nvalid is all-miss
    nvalid = 1100
    nbr_np[:, nvalid:] = m
    nbr_np = np.where(nbr_np >= nvalid, m, nbr_np)  # no hits INTO the tail either
    nbr = jnp.asarray(nbr_np)

    anyok = (nbr_np < m).any(axis=0)
    got_rows = int(_active_rows(jnp.asarray(nbr_np) < m)[0])
    assert got_rows == int(np.flatnonzero(anyok).max()) + 1 <= nvalid

    feats = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((27, c, c)).astype(np.float32) * 0.2)
    g = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))

    ref = gather_conv(feats, nbr, w)
    out = subm_conv_fwd(feats, nbr, w, tile=128, window=512, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    assert np.all(np.asarray(out)[nvalid:] == 0.0)

    def loss(feats, w):
        return jnp.sum(gather_conv(feats, nbr, w) * g)

    dx_ref, dw_ref = jax.grad(loss, argnums=(0, 1))(feats, w)
    dx, dw = subm_conv_bwd(feats, g, nbr, w, tile=128, window=512, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=2e-4, atol=2e-4)


def test_fused_bnrelu_fwd_matches_oracle():
    """conv(relu(x*s+t)) with the affine+ReLU applied in-kernel must match
    the unfused composition (reference ResidualBlock pre-activation,
    sparse_unet3d.py:103-172)."""
    rng = np.random.default_rng(9)
    m, k, c = 4096, 27, 32
    nbr = make_tables(m, k, rng)
    feats = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.5 + 1.0)
    t = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.2)
    w = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32) * 0.2)

    ref = gather_conv(jax.nn.relu(feats * s[None] + t[None]), nbr, w)
    out = subm_conv_fwd(feats, nbr, w, tile=256, window=1024, interpret=True,
                        affine=(s, t))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_bnrelu_bwd_matches_autodiff():
    rng = np.random.default_rng(10)
    m, c = 2048, 32
    nbr = real_table(m, rng)
    feats = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.5 + 1.0)
    t = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.2)
    w = jnp.asarray(rng.standard_normal((27, c, c)).astype(np.float32) * 0.2)
    g = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))

    def loss(feats, s, t, w):
        h = jax.nn.relu(feats * s[None] + t[None])
        return jnp.sum(gather_conv(h, nbr, w) * g)

    dx_ref, ds_ref, dt_ref, dw_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(feats, s, t, w)
    dx, dw, ds, dt = subm_conv_bwd(feats, g, nbr, w, tile=256, window=1024,
                                   interpret=True, affine=(s, t))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ds_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dt), np.asarray(dt_ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("c", [32, 96])
def test_bwd_v4_matches_autodiff(c, monkeypatch):
    """v4 lane-concat backward (one dot per offset) vs autodiff — packed
    (c=32, p=4) and unpacked (c=96, p=1) widths."""
    import tpu3dwsis.ops.pallas_spconv2 as ps2

    monkeypatch.setattr(ps2, "_BWD_V4", True)
    rng = np.random.default_rng(12)
    m = 1024
    nbr = real_table(m, rng, shape=(32, 32, 32))
    feats = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((27, c, c)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))

    def loss(feats, w):
        return jnp.sum(gather_conv(feats, nbr, w) * g)

    dx_ref, dw_ref = jax.grad(loss, argnums=(0, 1))(feats, w)
    dx, dw = subm_conv_bwd(feats, g, nbr, w, tile=128, window=512, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=2e-4, atol=2e-4)


def test_bwd_v4_rect_fused_affine(monkeypatch):
    """v4 backward with Cin != Cout AND the fused BN+ReLU epilogue
    (dx, dW, ds, dt all must match autodiff)."""
    import tpu3dwsis.ops.pallas_spconv2 as ps2

    monkeypatch.setattr(ps2, "_BWD_V4", True)
    rng = np.random.default_rng(13)
    m, cin, cout = 1024, 64, 32
    nbr = real_table(m, rng, shape=(32, 32, 32))
    feats = jnp.asarray(rng.standard_normal((m, cin)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal(cin).astype(np.float32) * 0.5 + 1.0)
    t = jnp.asarray(rng.standard_normal(cin).astype(np.float32) * 0.2)
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2)
    g = jnp.asarray(rng.standard_normal((m, cout)).astype(np.float32))

    def loss(feats, s, t, w):
        h = jax.nn.relu(feats * s[None] + t[None])
        return jnp.sum(gather_conv(h, nbr, w) * g)

    dx_ref, ds_ref, dt_ref, dw_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(feats, s, t, w)
    dx, dw, ds, dt = subm_conv_bwd(feats, g, nbr, w, tile=128, window=512,
                                   interpret=True, affine=(s, t))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ds_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dt), np.asarray(dt_ref), rtol=2e-4, atol=2e-4)


def test_bwd_v4_far_rows(monkeypatch):
    """v4 backward with a window small enough to force the far path."""
    import tpu3dwsis.ops.pallas_spconv2 as ps2

    monkeypatch.setattr(ps2, "_BWD_V4", True)
    rng = np.random.default_rng(14)
    m, c = 1024, 32
    nbr = real_table(m, rng, shape=(32, 32, 32))
    feats = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((27, c, c)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))

    def loss(feats, w):
        return jnp.sum(gather_conv(feats, nbr, w) * g)

    dx_ref, dw_ref = jax.grad(loss, argnums=(0, 1))(feats, w)
    dx, dw = subm_conv_bwd(feats, g, nbr, w, tile=128, window=256, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("c", [96, 192])
def test_fwd_v3p1_matches_oracle(c, monkeypatch):
    """v3 forward extended to unpacked widths (p=1): the per-group
    ``win @ wcat`` fold must match the oracle, including misses and far
    rows, at the L2 (96) and tail-concat (192) widths."""
    import tpu3dwsis.ops.pallas_spconv2 as ps2

    monkeypatch.setattr(ps2, "_FWD_V3P1", True)
    rng = np.random.default_rng(15)
    m, k = 2048, 27
    nbr = make_tables(m, k, rng, plane=700)
    feats = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32) * 0.1)
    ref = gather_conv(feats, nbr, w)
    out = subm_conv_fwd(feats, nbr, w, tile=128, window=512, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fwd_v3p1_fused_affine(monkeypatch):
    """v3-p1 forward with the fused pre-activation BN+ReLU."""
    import tpu3dwsis.ops.pallas_spconv2 as ps2

    monkeypatch.setattr(ps2, "_FWD_V3P1", True)
    rng = np.random.default_rng(16)
    m, k, c = 2048, 27, 96
    nbr = make_tables(m, k, rng, plane=700)
    feats = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.5 + 1.0)
    t = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.2)
    w = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32) * 0.1)
    ref = gather_conv(jax.nn.relu(feats * s[None] + t[None]), nbr, w)
    out = subm_conv_fwd(feats, nbr, w, tile=128, window=512, interpret=True,
                        affine=(s, t))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_bnrelu_bwd_far_rows():
    """Fused backward with a window small enough to force far-row folding."""
    rng = np.random.default_rng(11)
    m, c = 1024, 64
    nbr = real_table(m, rng, shape=(32, 32, 32))
    feats = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.5 + 1.0)
    t = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.2)
    w = jnp.asarray(rng.standard_normal((27, c, c)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.standard_normal((m, c)).astype(np.float32))

    def loss(feats, s, t, w):
        h = jax.nn.relu(feats * s[None] + t[None])
        return jnp.sum(gather_conv(h, nbr, w) * g)

    dx_ref, ds_ref, dt_ref, dw_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(feats, s, t, w)
    out_ref = gather_conv(jax.nn.relu(feats * s[None] + t[None]), nbr, w)
    out = subm_conv_fwd(feats, nbr, w, tile=128, window=256, interpret=True,
                        affine=(s, t))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=2e-4, atol=2e-4)
    dx, dw, ds, dt = subm_conv_bwd(feats, g, nbr, w, tile=128, window=256,
                                   interpret=True, affine=(s, t))
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ds), np.asarray(ds_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dt), np.asarray(dt_ref), rtol=2e-4, atol=2e-4)
