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
