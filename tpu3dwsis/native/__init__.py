"""ctypes bindings for the native host library (``native/wsis_native.cpp``).

Build: ``cmake -S native -B native/build -G Ninja && cmake --build
native/build`` (or :func:`build_native` below which shells out to g++
directly). Every entry point has a pure-numpy fallback so the framework
works without the native build; the native path is the fast one for large
scenes (OpenMP-parallel KNN / segmentation / cut-pursuit).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CANDIDATES = [
    os.path.join(_REPO, "native", "build", "libwsis_native.so"),
    os.path.join(_REPO, "native", "libwsis_native.so"),
]

_lib: Optional[ctypes.CDLL] = None


def _src_hash() -> str:
    import hashlib

    src = os.path.join(_REPO, "native", "wsis_native.cpp")
    try:
        with open(src, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()
    except OSError:
        return ""


_HASH_SIDECAR = os.path.join(_REPO, "native", ".so_src_hash")


def build_native(force: bool = False) -> Optional[str]:
    """Compile the shared library with g++ (no cmake required).

    Writes a source-hash sidecar next to the .so so :func:`get_lib` can
    detect a binary built from OLDER source — the exact state a container
    recycle restores when the .so in git lags the .cpp."""
    out = _CANDIDATES[1]
    src = os.path.join(_REPO, "native", "wsis_native.cpp")
    if os.path.exists(out) and not force:
        return out
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
        src, "-o", out,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        try:
            with open(_HASH_SIDECAR, "w") as f:
                f.write(_src_hash())
        except OSError:
            pass
        return out
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _is_stale(path: str) -> bool:
    """True when ``path`` is the repo-root .so and its recorded source hash
    differs from the current wsis_native.cpp (binary predates the source)."""
    if path != _CANDIDATES[1]:
        return False  # cmake build dir is developer-managed
    try:
        with open(_HASH_SIDECAR) as f:
            recorded = f.read().strip()
    except OSError:
        return True  # no record — assume stale, a rebuild is cheap (~5 s)
    return recorded != _src_hash()


def get_lib(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    found = None
    for path in _CANDIDATES:
        if os.path.exists(path):
            found = path
            break
    if found is not None and _is_stale(found) and build_if_missing:
        if build_native(force=True) is None:
            # toolchain unavailable: better a stale lib than none — but say
            # so, because a pre-r5 binary under the r5 declarations returns
            # e.g. cut_pursuit energy=0.0 silently
            import warnings

            warnings.warn(
                "wsis_native.so is older than wsis_native.cpp and g++ is "
                "unavailable to rebuild it; native results may lag the "
                "source (rebuild with: cd native && g++ -O3 -shared -fPIC "
                "-fopenmp -std=c++17 wsis_native.cpp -o libwsis_native.so)",
                RuntimeWarning,
                stacklevel=2,
            )
    if found is None:
        if build_if_missing and build_native():
            found = _CANDIDATES[1]
        else:
            return None
    _lib = ctypes.CDLL(found)
    _declare(_lib)
    return _lib


def _declare(lib: ctypes.CDLL):
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.wsis_knn_graph.argtypes = [f32, ctypes.c_int, ctypes.c_int, ctypes.c_float, i32]
    lib.wsis_felzenszwalb_mesh.argtypes = [
        f32, ctypes.c_int, i32, ctypes.c_int, ctypes.c_float, ctypes.c_int, i32,
    ]
    lib.wsis_felzenszwalb_mesh.restype = ctypes.c_int
    lib.wsis_compute_geof.argtypes = [f32, ctypes.c_int, ctypes.c_int, ctypes.c_float, f32]
    lib.wsis_cut_pursuit_l0.argtypes = [
        f32, ctypes.c_int, ctypes.c_int, i32, i32, f32,
        ctypes.c_int, ctypes.c_float, ctypes.c_int, i32,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.wsis_cut_pursuit_l0.restype = ctypes.c_int
    lib.wsis_edge_features.argtypes = [
        f32, ctypes.c_int, i32, i32, i32, ctypes.c_int, f32, f32,
        i32, i32, ctypes.c_int, ctypes.c_int, ctypes.c_uint64, f32,
    ]


# ------------------------------------------------------------ public wrappers

def knn_graph(xyz: np.ndarray, k: int, cell: float = 0.1) -> np.ndarray:
    """[N, k] nearest-neighbour indices (-1 padding). Native or scipy."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    lib = get_lib()
    if lib is not None:
        out = np.empty((len(xyz), k), np.int32)
        lib.wsis_knn_graph(xyz, len(xyz), k, cell, out)
        return out
    from scipy.spatial import cKDTree

    tree = cKDTree(xyz)
    _, nbr = tree.query(xyz, k=k + 1)
    return nbr[:, 1:].astype(np.int32)


def felzenszwalb_mesh(
    vertices: np.ndarray, faces: np.ndarray, kthr: float = 0.01, seg_min_verts: int = 20
) -> np.ndarray:
    """ScanNet-style superpoints from a mesh (segmentator parity)."""
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    lib = get_lib()
    out = np.empty(len(vertices), np.int32)
    if lib is not None:
        lib.wsis_felzenszwalb_mesh(
            vertices, len(vertices), faces, len(faces), kthr, seg_min_verts, out
        )
        return out
    return _felzenszwalb_numpy(vertices, faces, kthr, seg_min_verts)


def compute_geof(xyz: np.ndarray, k: int = 45, cell: float = 0.15) -> np.ndarray:
    """[N, 4] linearity/planarity/scattering/verticality (ply_c parity)."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    lib = get_lib()
    if lib is not None:
        out = np.empty((len(xyz), 4), np.float32)
        lib.wsis_compute_geof(xyz, len(xyz), k, cell, out)
        return out
    return _geof_numpy(xyz, k)


def cut_pursuit_l0(
    feat: np.ndarray,
    edges_u: np.ndarray,
    edges_v: np.ndarray,
    edge_weight: np.ndarray,
    reg: float = 0.03,
    max_iter: int = 10,
    return_energy: bool = False,
):
    """L0 cut-pursuit partition → component id per node (libcp parity).

    The native loop is a strict descent on the reference energy
    E = Σ‖f_i − mean_comp(i)‖² + reg·Σ_{cut} w_e (``CutPursuit.h:83-95``);
    ``return_energy=True`` additionally returns the final E."""
    feat = np.ascontiguousarray(feat, np.float32)
    eu = np.ascontiguousarray(edges_u, np.int32)
    ev = np.ascontiguousarray(edges_v, np.int32)
    ew = np.ascontiguousarray(edge_weight, np.float32)
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable; cut_pursuit_l0 has no numpy fallback")
    out = np.empty(len(feat), np.int32)
    energy = ctypes.c_float(0.0)
    lib.wsis_cut_pursuit_l0(
        feat, len(feat), feat.shape[1], eu, ev, ew, len(eu), reg, max_iter, out,
        ctypes.byref(energy),
    )
    if return_energy:
        return out, float(energy.value)
    return out


def edge_features(
    xyz: np.ndarray,
    superpoint: np.ndarray,
    edges: np.ndarray,
    centroid: np.ndarray,
    shape_feats: np.ndarray,
    max_sample: int = 128,
    seed: int = 0,
):
    """Native 13-d edge features (unstandardized); returns ``[E, 13]`` or
    ``None`` if the native library is unavailable."""
    lib = get_lib()
    if lib is None or len(edges) == 0:
        return None
    xyz = np.ascontiguousarray(xyz, np.float32)
    n_sp = int(superpoint.max()) + 1
    order = np.argsort(superpoint, kind="stable").astype(np.int32)
    counts = np.bincount(superpoint, minlength=n_sp).astype(np.int32)
    starts = np.zeros(n_sp, np.int32)
    starts[1:] = np.cumsum(counts)[:-1]
    eu = np.ascontiguousarray(edges[:, 0], np.int32)
    ev = np.ascontiguousarray(edges[:, 1], np.int32)
    out = np.empty((len(edges), 13), np.float32)
    lib.wsis_edge_features(
        xyz, len(xyz), order, starts, counts, n_sp,
        np.ascontiguousarray(centroid, np.float32),
        np.ascontiguousarray(shape_feats, np.float32),
        eu, ev, len(edges), max_sample, seed, out,
    )
    return out


# --------------------------------------------------------- numpy fallbacks

def _felzenszwalb_numpy(vertices, faces, kthr, seg_min_verts):
    normals = np.zeros_like(vertices)
    va, vb, vc = vertices[faces[:, 0]], vertices[faces[:, 1]], vertices[faces[:, 2]]
    fn = np.cross(vb - va, vc - va)
    for col in range(3):
        np.add.at(normals, faces[:, col], fn)
    normals /= np.maximum(np.linalg.norm(normals, axis=1, keepdims=True), 1e-12)

    pairs = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    w = 1.0 - (normals[pairs[:, 0]] * normals[pairs[:, 1]]).sum(1)
    d = vertices[pairs[:, 1]] - vertices[pairs[:, 0]]
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    convex = (normals[pairs[:, 0]] * d).sum(1) < 0
    w = np.where(convex, w * w, w)

    order = np.argsort(w)
    parent = np.arange(len(vertices))
    size = np.ones(len(vertices), np.int64)
    thr = np.full(len(vertices), kthr)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for ei in order:
        a, b = find(pairs[ei, 0]), find(pairs[ei, 1])
        if a == b:
            continue
        if w[ei] <= thr[a] and w[ei] <= thr[b]:
            parent[b] = a
            size[a] += size[b]
            thr[a] = w[ei] + kthr / size[a]
    for ei in order:
        a, b = find(pairs[ei, 0]), find(pairs[ei, 1])
        if a != b and (size[a] < seg_min_verts or size[b] < seg_min_verts):
            parent[b] = a
            size[a] += size[b]
    roots = np.array([find(i) for i in range(len(vertices))])
    _, seg = np.unique(roots, return_inverse=True)
    return seg.astype(np.int32)


def _geof_numpy(xyz, k):
    from scipy.spatial import cKDTree

    tree = cKDTree(xyz)
    _, nbr = tree.query(xyz, k=min(k + 1, len(xyz)))
    pts = xyz[nbr]  # [N, k+1, 3]
    mean = pts.mean(1, keepdims=True)
    d = pts - mean
    cov = np.einsum("nkd,nke->nde", d, d) / pts.shape[1]
    w, V = np.linalg.eigh(cov)  # ascending; V[:, :, i] is the i-th vector
    raw = np.maximum(w[:, ::-1], 0)  # descending raw eigenvalues
    V = V[:, :, ::-1]
    ev = np.sqrt(raw)
    l1, l2, l3 = ev[:, 0], ev[:, 1], ev[:, 2]
    linearity = (l1 - l2) / (l1 + 1e-12)
    planarity = (l2 - l3) / (l1 + 1e-12)
    scattering = l3 / (l1 + 1e-12)
    # SPG unary-vector verticality (ply_c.cpp:396-476): u_d = sum_i
    # lambda_i * |v_i[d]| over raw eigenvalues; verticality = u_z / ||u||
    u = np.einsum("ni,ndi->nd", raw, np.abs(V))
    un = np.linalg.norm(u, axis=1)
    verticality = np.where(un > 1e-24, u[:, 2] / np.maximum(un, 1e-24), 0.0)
    return np.stack([linearity, planarity, scattering, verticality], 1).astype(np.float32)
