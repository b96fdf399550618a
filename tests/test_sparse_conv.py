"""Sparse conv vs dense-numpy oracle on a tiny grid (subm / down / inverse)."""
import jax.numpy as jnp
import numpy as np

from tpu3dwsis.ops import rulebook, sparse_conv, voxelize


def _random_scene(rng, n_active=40, shape=(8, 8, 8), batch=2):
    # distinct random active coords per batch element
    seen = set()
    rows = []
    while len(rows) < n_active:
        c = (rng.integers(0, batch), *rng.integers(0, shape[0], 3))
        if c not in seen:
            seen.add(c)
            rows.append(c)
    return np.array(rows, dtype=np.int32)


def test_subm_down_inverse_vs_dense_oracle():
    rng = np.random.default_rng(3)
    shape, batch, cin, cout = (8, 8, 8), 2, 4, 5
    coords = _random_scene(rng, 40, shape, batch)
    m_pad = 64

    vox = voxelize.voxelize_coords(jnp.asarray(coords), shape, batch, m_pad)
    level0 = rulebook.VoxelLevel(keys=vox.keys, coords=vox.coords, valid=vox.valid)
    plan = rulebook.build_unet_plan(level0, shape, batch, num_levels=2, level_sizes=[m_pad, m_pad])

    m = int(vox.num_voxels)
    feats_np = np.zeros((m_pad, cin), np.float32)
    feats_np[:m] = rng.standard_normal((m, cin)).astype(np.float32)
    feats = jnp.asarray(feats_np)
    vc = np.asarray(vox.coords)[:m]  # valid voxel coords, sorted by key

    # dense volume per batch elem for the oracle
    dense = np.zeros((batch, *shape, cin), np.float32)
    active = np.zeros((batch, *shape), bool)
    for i, (b, x, y, z) in enumerate(vc):
        dense[b, x, y, z] = feats_np[i]
        active[b, x, y, z] = True

    # ---- submanifold 3x3x3 ----
    w = rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.2
    got = np.asarray(sparse_conv.subm_conv(feats, plan.levels[0].subm_nbr, jnp.asarray(w)))
    offs = rulebook.subm_offsets(3)
    for i, (b, x, y, z) in enumerate(vc):
        want = np.zeros(cout, np.float32)
        for k, (dx, dy, dz) in enumerate(offs):
            q = (x + dx, y + dy, z + dz)
            if all(0 <= q[d] < shape[d] for d in range(3)) and active[b][q]:
                want += dense[b][q] @ w[k]
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)

    # ---- downsample k2 s2 ----
    wd = rng.standard_normal((8, cin, cout)).astype(np.float32) * 0.2
    down_nbr = plan.levels[0].down_nbr
    got_d = np.asarray(
        sparse_conv.down_conv(
            feats, down_nbr, plan.levels[0].parent, plan.levels[0].child_offset, jnp.asarray(wd)
        )
    )
    coarse = plan.levels[1].level
    mc = int(np.asarray(coarse.valid).sum())
    cc = np.asarray(coarse.coords)[:mc]
    doffs = rulebook.down_offsets()
    for i, (b, x, y, z) in enumerate(cc):
        want = np.zeros(cout, np.float32)
        for k, (dx, dy, dz) in enumerate(doffs):
            q = (2 * x + dx, 2 * y + dy, 2 * z + dz)
            if all(q[d] < shape[d] for d in range(3)) and active[b][q]:
                want += dense[b][q] @ wd[k]
        np.testing.assert_allclose(got_d[i], want, rtol=1e-4, atol=1e-4)
    # coarse set = unique halved coords
    want_coarse = {(b, x // 2, y // 2, z // 2) for b, x, y, z in vc}
    assert want_coarse == {tuple(r) for r in cc}

    # ---- inverse conv coarse->fine (gather formulation) ----
    cfeat_np = np.zeros((m_pad, cout), np.float32)
    cfeat_np[:mc] = rng.standard_normal((mc, cout)).astype(np.float32)
    wi = rng.standard_normal((8, cout, cin)).astype(np.float32) * 0.2
    got_i = np.asarray(
        sparse_conv.inverse_conv(
            jnp.asarray(cfeat_np),
            plan.levels[0].parent,
            plan.levels[0].child_offset,
            down_nbr,
            jnp.asarray(wi),
        )
    )
    # scatter (reference) formulation must agree
    got_sc = np.asarray(
        sparse_conv.inverse_conv_scatter(jnp.asarray(cfeat_np), down_nbr, jnp.asarray(wi), m_pad)
    )
    np.testing.assert_allclose(got_i, got_sc, rtol=1e-4, atol=1e-5)
    coarse_index = {tuple(r): i for i, r in enumerate(cc)}
    for i, (b, x, y, z) in enumerate(vc):
        p = coarse_index[(b, x // 2, y // 2, z // 2)]
        k = ((x % 2) * 2 + (y % 2)) * 2 + (z % 2)  # row-major (dx,dy,dz)
        want = cfeat_np[p] @ wi[k]
        np.testing.assert_allclose(got_i[i], want, rtol=1e-4, atol=1e-4)
    # padding rows untouched
    np.testing.assert_array_equal(got_i[m:], 0.0)


def test_custom_vjp_matches_autodiff():
    """The gather-only backward (offset-flip symmetry) must equal plain
    autodiff of the gather formulation."""
    import jax

    rng = np.random.default_rng(5)
    shape, batch, cin, cout = (8, 8, 8), 1, 4, 6
    coords = _random_scene(rng, 50, shape, batch)
    m_pad = 64
    vox = voxelize.voxelize_coords(jnp.asarray(coords), shape, batch, m_pad)
    level0 = rulebook.VoxelLevel(keys=vox.keys, coords=vox.coords, valid=vox.valid)
    plan = rulebook.build_unet_plan(level0, shape, batch, 2, [m_pad, m_pad])
    lp = plan.levels[0]

    feats = jnp.asarray(rng.standard_normal((m_pad, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((27, cin, cin)).astype(np.float32) * 0.2)
    cot = jnp.asarray(rng.standard_normal((m_pad, cin)).astype(np.float32))

    # ---- subm ----
    f_custom = lambda x, w: (sparse_conv.subm_conv(x, lp.subm_nbr, w) * cot).sum()
    f_auto = lambda x, w: (sparse_conv.gather_conv(x, lp.subm_nbr, w) * cot).sum()
    gx_c, gw_c = jax.grad(f_custom, argnums=(0, 1))(feats, w)
    gx_a, gw_a = jax.grad(f_auto, argnums=(0, 1))(feats, w)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_a), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_a), rtol=1e-4, atol=1e-5)

    # ---- down ----
    wd = jnp.asarray(rng.standard_normal((8, cin, cout)).astype(np.float32) * 0.2)
    cot_d = jnp.asarray(rng.standard_normal((m_pad, cout)).astype(np.float32))
    f_custom = lambda x, w: (
        sparse_conv.down_conv(x, lp.down_nbr, lp.parent, lp.child_offset, w) * cot_d
    ).sum()
    f_auto = lambda x, w: (sparse_conv.gather_conv(x, lp.down_nbr, w) * cot_d).sum()
    gx_c, gw_c = jax.grad(f_custom, argnums=(0, 1))(feats, wd)
    gx_a, gw_a = jax.grad(f_auto, argnums=(0, 1))(feats, wd)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_a), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_a), rtol=1e-4, atol=1e-5)

    # ---- inverse ----
    cfeat = jnp.asarray(rng.standard_normal((m_pad, cout)).astype(np.float32))
    wi = jnp.asarray(rng.standard_normal((8, cout, cin)).astype(np.float32) * 0.2)
    cot_i = jnp.asarray(rng.standard_normal((m_pad, cin)).astype(np.float32))
    f_custom = lambda x, w: (
        sparse_conv.inverse_conv(x, lp.parent, lp.child_offset, lp.down_nbr, w) * cot_i
    ).sum()
    f_auto = lambda x, w: (
        sparse_conv.inverse_conv_raw(x, lp.parent, lp.child_offset, w) * cot_i
    ).sum()
    gx_c, gw_c = jax.grad(f_custom, argnums=(0, 1))(cfeat, wi)
    gx_a, gw_a = jax.grad(f_auto, argnums=(0, 1))(cfeat, wi)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_a), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_a), rtol=1e-4, atol=1e-5)


def test_downsample_sortfree_matches_unique_oracle():
    """The sort-free coarse unique (adjacent-diff on already-sorted halved
    keys) must equal the jnp.unique formulation, incl. overflow truncation."""
    from tpu3dwsis.ops.hashgrid import PAD_KEY, pack_coords

    rng = np.random.default_rng(17)
    shape, batch = (16, 16, 16), 2
    coords = _random_scene(rng, 300, shape, batch)
    m_pad = 384
    vox = voxelize.voxelize_coords(jnp.asarray(coords), shape, batch, m_pad)
    fine = rulebook.VoxelLevel(keys=vox.keys, coords=vox.coords, valid=vox.valid)

    for cap in (m_pad, 40):  # ample capacity AND forced overflow truncation
        coarse, down_nbr, parent, child_offset = rulebook.build_downsample(
            fine, shape, batch, cap
        )
        coarse_shape = tuple((s + 1) // 2 for s in shape)
        cc = np.asarray(fine.coords).copy()
        cc[:, 1:] //= 2
        ckeys = np.asarray(
            pack_coords(jnp.asarray(cc), coarse_shape, batch, valid=fine.valid)
        )
        uniq_ref = np.unique(ckeys[ckeys != PAD_KEY])
        keep = uniq_ref[:cap]
        got = np.asarray(coarse.keys)
        np.testing.assert_array_equal(got[: len(keep)], keep)
        assert np.all(got[len(keep):] == PAD_KEY)
        # parent: rows whose coarse key survived point at its slot, rest null
        par = np.asarray(parent)
        for i in range(len(ckeys)):
            if ckeys[i] == PAD_KEY:
                assert par[i] == cap
            else:
                j = np.searchsorted(keep, ckeys[i])
                if j < len(keep) and keep[j] == ckeys[i]:
                    assert par[i] == j
                else:
                    assert par[i] == cap


def test_down_conv_bnrelu_matches_autodiff():
    """Fused BN+ReLU down conv: dispatch fallback AND the Pallas custom-VJP
    (interpret mode) must both match autodiff of the unfused composition."""
    import functools

    import jax

    from tpu3dwsis.ops import pallas_spconv2 as p2
    from tpu3dwsis.ops import sparse_conv as sc

    rng = np.random.default_rng(23)
    shape, batch, cin, cout = (12, 12, 12), 1, 32, 32
    coords = _random_scene(rng, 500, shape, batch)
    m_pad = 512
    vox = voxelize.voxelize_coords(jnp.asarray(coords), shape, batch, m_pad)
    level0 = rulebook.VoxelLevel(keys=vox.keys, coords=vox.coords, valid=vox.valid)
    plan = rulebook.build_unet_plan(level0, shape, batch, 2, [m_pad, 256])
    lp = plan.levels[0]

    feats = jnp.asarray(rng.standard_normal((m_pad, cin)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal(cin).astype(np.float32) * 0.5 + 1.0)
    t = jnp.asarray(rng.standard_normal(cin).astype(np.float32) * 0.2)
    w = jnp.asarray(rng.standard_normal((8, cin, cout)).astype(np.float32) * 0.2)
    cot = jnp.asarray(rng.standard_normal((256, cout)).astype(np.float32))

    def f_ref(x, s, t, w):
        h = jax.nn.relu(x * s[None] + t[None])
        return (sparse_conv.gather_conv(h, lp.down_nbr, w) * cot).sum()

    refs = jax.grad(f_ref, argnums=(0, 1, 2, 3))(feats, s, t, w)

    def f_fused(x, s, t, w):
        return (
            sparse_conv.down_conv_bnrelu(
                x, s, t, lp.down_nbr, lp.parent, lp.child_offset, w
            ) * cot
        ).sum()

    # 1) CPU dispatch fallback
    for got, ref in zip(jax.grad(f_fused, argnums=(0, 1, 2, 3))(feats, s, t, w), refs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    # 2) Pallas custom-VJP (interpret mode, forced dispatch, small windows)
    import pytest

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(sc, "_CONV_IMPL", "pallas")
        mp.setattr(sc, "_PALLAS_TILE", 64)
        mp.setattr(sc, "_PALLAS_WINDOW_DOWN", 128)
        mp.setattr(sc, "_FUSE_BN", True)
        mp.setattr(p2, "subm_conv_fwd", functools.partial(p2.subm_conv_fwd, interpret=True))
        mp.setattr(p2, "table_weight_grad", functools.partial(p2.table_weight_grad, interpret=True))
        out_fused = sparse_conv.down_conv_bnrelu(
            feats, s, t, lp.down_nbr, lp.parent, lp.child_offset, w
        )
        out_ref = sparse_conv.gather_conv(
            jax.nn.relu(feats * s[None] + t[None]), lp.down_nbr, w
        )
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_ref), rtol=2e-4, atol=2e-4
        )
        for got, ref in zip(
            jax.grad(f_fused, argnums=(0, 1, 2, 3))(feats, s, t, w), refs
        ):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
            )
    finally:
        mp.undo()


def test_inverse_conv_bnrelu_matches_autodiff():
    """Fused BN+ReLU inverse conv: dispatch fallback AND the fused custom-VJP
    (interpret mode) must both match autodiff of the unfused composition."""
    import functools

    import jax

    from tpu3dwsis.ops import pallas_spconv2 as p2
    from tpu3dwsis.ops import sparse_conv as sc

    rng = np.random.default_rng(29)
    shape, batch, cin, cout = (12, 12, 12), 1, 64, 32
    coords = _random_scene(rng, 500, shape, batch)
    m_pad = 512
    vox = voxelize.voxelize_coords(jnp.asarray(coords), shape, batch, m_pad)
    level0 = rulebook.VoxelLevel(keys=vox.keys, coords=vox.coords, valid=vox.valid)
    plan = rulebook.build_unet_plan(level0, shape, batch, 2, [m_pad, 256])
    lp = plan.levels[0]
    m_c = 256  # coarse capacity

    feats = jnp.asarray(rng.standard_normal((m_c, cin)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal(cin).astype(np.float32) * 0.5 + 1.0)
    t = jnp.asarray(rng.standard_normal(cin).astype(np.float32) * 0.2)
    w = jnp.asarray(rng.standard_normal((8, cin, cout)).astype(np.float32) * 0.2)
    cot = jnp.asarray(rng.standard_normal((m_pad, cout)).astype(np.float32))

    def f_ref(x, s, t, w):
        h = jax.nn.relu(x * s[None] + t[None])
        out = sparse_conv.inverse_conv_raw(h, lp.parent, lp.child_offset, w)
        return (out * cot).sum()

    refs = jax.grad(f_ref, argnums=(0, 1, 2, 3))(feats, s, t, w)

    def f_fused(x, s, t, w):
        return (
            sparse_conv.inverse_conv_bnrelu(
                x, s, t, lp.parent, lp.child_offset, lp.down_nbr, w
            ) * cot
        ).sum()

    # 1) CPU dispatch fallback
    for got, ref in zip(jax.grad(f_fused, argnums=(0, 1, 2, 3))(feats, s, t, w), refs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    # 2) fused custom-VJP (interpret-mode Pallas backward, forced dispatch)
    import pytest

    mp = pytest.MonkeyPatch()
    try:
        mp.setattr(sc, "_CONV_IMPL", "pallas")
        mp.setattr(sc, "_PALLAS_TILE", 64)
        mp.setattr(sc, "_PALLAS_WINDOW_DOWN", 128)
        mp.setattr(sc, "_FUSE_BN", True)
        mp.setattr(p2, "subm_conv_fwd", functools.partial(p2.subm_conv_fwd, interpret=True))
        mp.setattr(p2, "table_weight_grad", functools.partial(p2.table_weight_grad, interpret=True))
        out_fused = sparse_conv.inverse_conv_bnrelu(
            feats, s, t, lp.parent, lp.child_offset, lp.down_nbr, w
        )
        out_ref = sparse_conv.inverse_conv_raw(
            jax.nn.relu(feats * s[None] + t[None]), lp.parent, lp.child_offset, w
        )
        np.testing.assert_allclose(
            np.asarray(out_fused), np.asarray(out_ref), rtol=2e-4, atol=2e-4
        )
        for got, ref in zip(
            jax.grad(f_fused, argnums=(0, 1, 2, 3))(feats, s, t, w), refs
        ):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
            )
    finally:
        mp.undo()
