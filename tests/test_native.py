"""Native C++ library vs numpy/scipy oracles."""
import numpy as np
import pytest

from tpu3dwsis import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library not built and g++ unavailable")
    return lib


def test_knn_graph_matches_scipy(lib):
    rng = np.random.default_rng(0)
    xyz = rng.uniform(0, 2, (500, 3)).astype(np.float32)
    got = native.knn_graph(xyz, k=5, cell=0.3)
    from scipy.spatial import cKDTree

    _, want = cKDTree(xyz).query(xyz, k=6)
    # same neighbor sets (order can differ on ties)
    agree = 0
    for i in range(len(xyz)):
        agree += len(set(got[i]) & set(want[i, 1:]))
    assert agree / (len(xyz) * 5) > 0.99


def test_felzenszwalb_mesh_segments_two_planes(lib):
    # two perpendicular planes meeting at an edge -> at least 2 segments,
    # each plane dominated by one segment
    nx, nz = 20, 10
    verts = []
    for i in range(nx):
        for j in range(nz):
            verts.append([i * 0.1, j * 0.1, 0.0])  # floor
    for i in range(nx):
        for j in range(nz):
            verts.append([i * 0.1, 0.0, (j + 1) * 0.1])  # wall
    verts = np.array(verts, np.float32)

    def grid_faces(base):
        fs = []
        for i in range(nx - 1):
            for j in range(nz - 1):
                a = base + i * nz + j
                b = a + nz
                fs.append([a, b, a + 1])
                fs.append([b, b + 1, a + 1])
        return fs

    faces = np.array(grid_faces(0) + grid_faces(nx * nz), np.int32)
    seg = native.felzenszwalb_mesh(verts, faces, kthr=0.05, seg_min_verts=10)
    assert seg.min() == 0 and len(np.unique(seg)) >= 2
    floor_seg = np.bincount(seg[: nx * nz]).argmax()
    wall_seg = np.bincount(seg[nx * nz :]).argmax()
    assert floor_seg != wall_seg
    assert (seg[: nx * nz] == floor_seg).mean() > 0.9
    assert (seg[nx * nz :] == wall_seg).mean() > 0.9


def test_geof_flat_plane_vs_line(lib):
    rng = np.random.default_rng(1)
    plane = np.column_stack(
        [rng.uniform(0, 1, 400), rng.uniform(0, 1, 400), rng.normal(0, 1e-4, 400)]
    ).astype(np.float32)
    geof = native.compute_geof(plane, k=20, cell=0.2)
    assert geof[:, 1].mean() > 0.7  # planarity high
    assert geof[:, 2].mean() < 0.1  # scattering low

    line = np.column_stack(
        [np.linspace(0, 2, 300), np.full(300, 0.5), np.full(300, 0.5)]
    ).astype(np.float32) + rng.normal(0, 1e-4, (300, 3)).astype(np.float32)
    geof_l = native.compute_geof(line, k=20, cell=0.2)
    assert geof_l[:, 0].mean() > 0.9  # linearity high


def test_cut_pursuit_separates_two_blobs(lib):
    rng = np.random.default_rng(2)
    # 1-d chain whose feature jumps at the midpoint
    n = 200
    feat = np.zeros((n, 3), np.float32)
    feat[: n // 2] = [0, 0, 0]
    feat[n // 2 :] = [5, 5, 5]
    feat += rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    eu = np.arange(n - 1, dtype=np.int32)
    ev = eu + 1
    ew = np.ones(n - 1, np.float32)
    comp = native.cut_pursuit_l0(feat, eu, ev, ew, reg=1.0, max_iter=8)
    # both halves nearly pure components
    first = np.bincount(comp[: n // 2]).argmax()
    second = np.bincount(comp[n // 2 :]).argmax()
    assert first != second
    assert (comp[: n // 2] == first).mean() > 0.95
    assert (comp[n // 2 :] == second).mean() > 0.95


def _geof_eigh_oracle(xyz, k):
    """Per-point [lin, plan, scat, vert] with numpy eigh and brute-force
    k-NN — the SPG formulation (ply_c.cpp:396-476): sqrt-eigenvalue shape
    ratios; verticality = u_z/||u|| with u_d = sum_i lambda_i*|v_i[d]|
    over RAW eigenvalues."""
    out = np.zeros((len(xyz), 4), np.float64)
    for i in range(len(xyz)):
        d2 = ((xyz - xyz[i]) ** 2).sum(1)
        idx = np.argsort(d2)[: k + 1]  # self + k nearest
        pts = xyz[idx]
        d = pts - pts.mean(0)
        cov = d.T @ d / len(pts)
        w, V = np.linalg.eigh(cov)
        raw = np.maximum(w[::-1], 0)
        V = V[:, ::-1]
        ev = np.sqrt(raw)
        out[i, 0] = (ev[0] - ev[1]) / (ev[0] + 1e-12)
        out[i, 1] = (ev[1] - ev[2]) / (ev[0] + 1e-12)
        out[i, 2] = ev[2] / (ev[0] + 1e-12)
        u = (raw[None, :] * np.abs(V)).sum(1)
        un = np.linalg.norm(u)
        out[i, 3] = u[2] / un if un > 1e-24 else 0.0
    return out


def test_geof_matches_eigh_oracle(lib):
    """VERDICT r4 #5: native geof (incl. the eigen-formulation verticality)
    vs a numpy eigh oracle on the same k-NN neighbourhoods."""
    rng = np.random.default_rng(7)
    xyz = rng.uniform(0, 1.5, (400, 3)).astype(np.float32)
    got = native.compute_geof(xyz, k=12, cell=0.5)
    want = _geof_eigh_oracle(xyz.astype(np.float64), 12)
    # grid-hash kNN can tie-break differently from brute force on a few
    # points; demand close agreement on the bulk
    diff = np.abs(got - want).max(1)
    assert np.quantile(diff, 0.9) < 0.05, np.quantile(diff, 0.9)
    assert np.median(np.abs(got[:, 3] - want[:, 3])) < 0.01


def test_geof_verticality_analytic(lib):
    """Verticality hits the SPG formulation's analytic values: ~0 on a
    horizontal plane, ~1/sqrt(2) on a vertical plane, ~1 on a vertical
    line (the pre-r5 covariance-share approximation inverted the plane
    cases)."""
    rng = np.random.default_rng(3)
    n = 400
    horiz = np.column_stack(
        [rng.uniform(0, 1, n), rng.uniform(0, 1, n), rng.normal(0, 1e-4, n)]
    ).astype(np.float32)
    v = native.compute_geof(horiz, k=20, cell=0.2)[:, 3]
    assert v.mean() < 0.1, v.mean()

    vert = np.column_stack(
        [rng.normal(0, 1e-4, n), rng.uniform(0, 1, n), rng.uniform(0, 1, n)]
    ).astype(np.float32)
    v = native.compute_geof(vert, k=20, cell=0.2)[:, 3]
    assert abs(v.mean() - 1 / np.sqrt(2)) < 0.1, v.mean()

    line = np.column_stack(
        [np.full(n, 0.5), np.full(n, 0.5), np.linspace(0, 2, n)]
    ).astype(np.float32) + rng.normal(0, 1e-4, (n, 3)).astype(np.float32)
    v = native.compute_geof(line, k=20, cell=0.2)[:, 3]
    assert v.mean() > 0.9, v.mean()


def test_cut_pursuit_energy_descent(lib):
    """VERDICT r4 #6: the split loop is a strict descent on the reference
    energy E = sum ||f_i - mean_c||^2 + reg * cut weight (CutPursuit.h:83-95):
    more iterations never raise E, and any accepted split lowers it below
    the single-component energy."""
    rng = np.random.default_rng(4)
    n = 300
    feat = np.zeros((n, 4), np.float32)
    feat[: n // 3, 0] = 0.0
    feat[n // 3 : 2 * n // 3, 0] = 3.0
    feat[2 * n // 3 :, 0] = 6.0
    feat += rng.normal(0, 0.1, (n, 4)).astype(np.float32)
    eu = np.arange(n - 1, dtype=np.int32)
    ev = eu + 1
    ew = np.ones(n - 1, np.float32)

    # E at the trivial 1-component partition (iter budget 0 splits nothing)
    mu = feat.mean(0)
    e0 = float(((feat - mu) ** 2).sum())

    prev = None
    for it in range(1, 6):
        comp, e = native.cut_pursuit_l0(
            feat, eu, ev, ew, reg=0.5, max_iter=it, return_energy=True
        )
        # returned energy matches the partition it returns
        k = comp.max() + 1
        fid = sum(
            float(((feat[comp == c] - feat[comp == c].mean(0)) ** 2).sum())
            for c in range(k)
        )
        cut = float(ew[comp[eu] != comp[ev]].sum())
        assert abs(e - (fid + 0.5 * cut)) < 1e-2 * max(1.0, abs(e))
        assert e < e0
        if prev is not None:
            assert e <= prev + 1e-4 * abs(prev)
        prev = e


def test_cut_pursuit_multiplane_partition_quality(lib):
    """Partition quality on a synthetic 3-plane scene (the reference uses
    cut-pursuit to carve S3DIS rooms into superpoints): three parallel
    planes with distinct geometry must land in >=3 components whose
    boundaries align with the plane boundaries (>=95% purity per plane),
    without shattering into noise-many pieces."""
    rng = np.random.default_rng(5)
    per = 300
    planes = []
    for z in (0.0, 1.0, 2.0):
        p = np.column_stack(
            [rng.uniform(0, 1, per), rng.uniform(0, 1, per), np.full(per, z)]
        )
        planes.append(p)
    xyz = np.concatenate(planes).astype(np.float32) + rng.normal(
        0, 0.005, (3 * per, 3)
    ).astype(np.float32)
    nbr = native.knn_graph(xyz, k=8, cell=0.3)
    eu = np.repeat(np.arange(len(xyz), dtype=np.int32), 8)
    ev = nbr.reshape(-1).astype(np.int32)
    keep = ev >= 0
    eu, ev = eu[keep], ev[keep]
    ew = np.ones(len(eu), np.float32)
    # partition on [geof, elevation] like the S3DIS pipeline (geof + color
    # features are homogeneous WITHIN a plane; raw xyz is not)
    feat = np.concatenate(
        [native.compute_geof(xyz, k=20, cell=0.3), xyz[:, 2:3]], axis=1
    ).astype(np.float32)
    comp = native.cut_pursuit_l0(feat, eu, ev, ew, reg=0.2, max_iter=10)
    labels = np.repeat(np.arange(3), per)
    k = comp.max() + 1
    assert k >= 3, k
    assert k <= 30, f"over-fragmented: {k} components"
    # each plane nearly pure: its points share one dominant component,
    # and that component does not leak across plane boundaries
    for p in range(3):
        mask = labels == p
        dom = np.bincount(comp[mask]).argmax()
        purity = (comp[mask] == dom).mean()
        leak = (comp[~mask] == dom).mean()
        assert purity > 0.95, (p, purity)
        assert leak < 0.02, (p, leak)


def test_stale_so_rebuilt_from_source_hash(tmp_path, monkeypatch):
    """A .so whose recorded source hash lags wsis_native.cpp (what a git
    checkout restores when the binary was committed before the source
    changed) must be rebuilt transparently by get_lib()."""
    import tpu3dwsis.native as nat

    lib = nat.get_lib()
    if lib is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    # poison the sidecar, drop the cached handle: next get_lib must rebuild.
    # Restore the tracked sidecar even on failure (a failed rebuild must not
    # leave the repo dirty and every later get_lib() retrying a rebuild).
    with open(nat._HASH_SIDECAR) as f:
        orig = f.read()
    try:
        with open(nat._HASH_SIDECAR, "w") as f:
            f.write("0" * 64)
        monkeypatch.setattr(nat, "_lib", None)
        assert nat.get_lib() is not None
        with open(nat._HASH_SIDECAR) as f:
            assert f.read().strip() == nat._src_hash()
    finally:
        with open(nat._HASH_SIDECAR) as f:
            now = f.read()
        if now.strip() != nat._src_hash():
            with open(nat._HASH_SIDECAR, "w") as f:
                f.write(orig)


def test_geof_verticality_exact_degenerate_inputs():
    """Grid-snapped (exactly degenerate) geometries: a rank-1 vertical line
    must read verticality 1, an exact horizontal grid plane 0 — the
    pre-r5-review eigenvector fallback discarded the valid axis and
    inverted the line case; a ratio-first pair selection regression made
    exact planes read ~0.45 at anisotropic boundary points."""
    native = pytest.importorskip("tpu3dwsis.native")
    if native.get_lib() is None:
        pytest.skip("native toolchain unavailable")

    z = np.arange(50, dtype=np.float32)
    zero = np.zeros(50, np.float32)
    vline = np.stack([zero, zero, z], 1)
    assert native.compute_geof(vline, k=10, cell=2.0)[:, 3].min() > 0.99

    hline = np.stack([z, zero, zero], 1)
    assert native.compute_geof(hline, k=10, cell=2.0)[:, 3].max() < 1e-6

    xs, ys = np.meshgrid(np.arange(10, dtype=np.float32),
                         np.arange(10, dtype=np.float32))
    flat = np.stack([xs.ravel(), ys.ravel(), np.zeros(100, np.float32)], 1)
    assert native.compute_geof(flat, k=12, cell=3.0)[:, 3].max() < 1e-6

    wall = np.stack([xs.ravel(), np.zeros(100, np.float32), ys.ravel()], 1)
    assert native.compute_geof(wall, k=12, cell=3.0)[:, 3].min() > 0.3
