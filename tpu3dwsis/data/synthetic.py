"""Synthetic scene generator for tests and benchmarks.

The reference has no test fixtures at all (SURVEY §4); we generate small
ScanNet-like scenes — a floor/wall background (classes 0/1, no instances,
mirroring ScanNet semantics where wall/floor carry no instance labels) plus
gaussian-blob furniture instances — with superpoints from coordinate-grid
clustering and a real superpoint graph via :mod:`tpu3dwsis.prep.graph_build`.
"""
from __future__ import annotations

import numpy as np

from ..prep.graph_build import build_superpoint_graph
from .scene import IGNORE, Scene

__all__ = ["make_scene", "make_room_scene"]


def _sample_quad(rng, origin, u, v, density, noise):
    """Uniform surface sample of a parallelogram with gaussian normal noise."""
    origin = np.asarray(origin, np.float64)
    u = np.asarray(u, np.float64)
    v = np.asarray(v, np.float64)
    nvec = np.cross(u, v)
    area = np.linalg.norm(nvec)
    n = int(rng.poisson(max(area, 1e-6) * density))
    if n == 0:
        return np.zeros((0, 3))
    a = rng.random(n)[:, None]
    b = rng.random(n)[:, None]
    pts = origin[None] + a * u[None] + b * v[None]
    if area > 0:
        pts += (nvec / area)[None] * rng.normal(0, noise, n)[:, None]
    return pts


def _sample_box(rng, center_xy, size, z0, density, noise, top=True):
    """Surface-sample an axis-aligned box (4 sides + optional top)."""
    sx, sy, sz = size
    x0, y0 = center_xy[0] - sx / 2, center_xy[1] - sy / 2
    quads = [
        ((x0, y0, z0), (sx, 0, 0), (0, 0, sz)),
        ((x0, y0 + sy, z0), (sx, 0, 0), (0, 0, sz)),
        ((x0, y0, z0), (0, sy, 0), (0, 0, sz)),
        ((x0 + sx, y0, z0), (0, sy, 0), (0, 0, sz)),
    ]
    if top:
        quads.append(((x0, y0, z0 + sz), (sx, 0, 0), (0, sy, 0)))
    return np.concatenate([_sample_quad(rng, *q, density, noise) for q in quads])


def make_room_scene(
    seed: int = 0,
    density: float = 2000.0,
    classes: int = 20,
    sp_grid: float = 0.17,
    noise: float = 0.005,
    max_points: int = 250000,
    room_range=(2.6, 5.4),
) -> Scene:
    """ScanNet-statistics room scene: *surface*-sampled geometry.

    Unlike :func:`make_scene` (small gaussian blobs for unit tests), scenes
    from this generator match the reference workload the TITAN-RTX baseline
    was measured on (``/root/reference/train_scannetv2.py:780``): ~100-250k
    points on 2D surfaces (floor, walls, box furniture), so the scale-50
    voxel ladder shrinks ~4x per k2s2 level like a real scan, point density
    ~2k/m2 (~2.2 cm spacing -> mostly-unique 2 cm voxels), ~15-25 instances,
    and instance-pure superpoints of ~50-60 points (the reference's
    Felzenszwalb segments average ~50 points; measured proxy-vs-reference
    statistics table in docs/PROXY_STATS.md, from scripts/proxy_stats.py).
    """
    rng = np.random.default_rng(seed)
    w = rng.uniform(*room_range)
    l = rng.uniform(*room_range)
    wall_h = rng.uniform(2.2, 2.7)

    xyz_list, sem_list, ins_list = [], [], []

    def add(pts, sem_id, ins_id):
        if len(pts) == 0:
            return
        xyz_list.append(pts)
        sem_list.append(np.full(len(pts), sem_id, np.int32))
        ins_list.append(np.full(len(pts), ins_id, np.int32))

    # floor (class 1) + 4 walls (class 0); background carries no instance id
    add(_sample_quad(rng, (0, 0, 0), (w, 0, 0), (0, l, 0), density, noise), 1, IGNORE)
    walls = [
        ((0, 0, 0), (w, 0, 0)),
        ((0, l, 0), (w, 0, 0)),
        ((0, 0, 0), (0, l, 0)),
        ((w, 0, 0), (0, l, 0)),
    ]
    for origin, u in walls:
        add(_sample_quad(rng, origin, u, (0, 0, wall_h), density, noise), 0, IGNORE)

    # furniture: boxes on the floor + thin wall-mounted quads.  Classes are
    # DETERMINISTIC functions of geometry (size bucket × aspect) so they are
    # learnable across scenes — random class assignment made val semantic /
    # instance AP structurally zero on this proxy (a class must have a
    # visual signature, like real furniture categories do).  Wall-mounted
    # classes: 2=door-like (tall), 3=window-like (wide), 4=picture-like
    # (small).  Floor boxes: classes 5..classes-1 by (footprint, height,
    # aspect) buckets; each class also gets a characteristic base hue.
    n_inst = max(6, int(rng.poisson(8 + 0.5 * w * l)))
    for i in range(n_inst):
        if rng.random() < 0.2:  # wall-mounted
            wi = int(rng.integers(0, 4))
            origin, u = walls[wi]
            ulen = np.linalg.norm(u)
            size_u = rng.uniform(0.4, 1.4)
            size_z = rng.uniform(0.4, 1.2)
            if size_z > 1.0 and size_u < 0.9:
                c = 2  # door-like
            elif size_u > 0.9:
                c = 3  # window-like
            else:
                c = 4  # picture-like
            t = rng.uniform(0.1, max(ulen - size_u - 0.1, 0.2))
            z0 = rng.uniform(0.1, max(wall_h - size_z - 0.1, 0.2))
            udir = np.asarray(u) / ulen
            nvec = np.cross(udir, (0, 0, 1.0))
            off = origin + udir * t + np.array([0, 0, z0]) - nvec * 0.03
            pts = _sample_quad(rng, off, udir * size_u, (0, 0, size_z), density, noise)
        else:
            size = np.array(
                [rng.uniform(0.25, 1.2), rng.uniform(0.25, 1.2), rng.uniform(0.25, 1.0)]
            )
            foot = int(size[0] * size[1] > 0.5)  # big/small footprint
            tall = int(size[2] > 0.6)
            elong = int(max(size[0], size[1]) > 2.0 * min(size[0], size[1]))
            vol = int(size.prod() > 0.25)
            bucket = ((foot * 2 + tall) * 2 + elong) * 2 + vol  # 0..15
            c = 5 + bucket % (classes - 5)
            cx = rng.uniform(0.3 + size[0] / 2, max(w - 0.3 - size[0] / 2, 0.6))
            cy = rng.uniform(0.3 + size[1] / 2, max(l - 0.3 - size[1] / 2, 0.6))
            pts = _sample_box(rng, (cx, cy), size, 0.0, density, noise)
        add(pts, c, i)

    xyz = np.concatenate(xyz_list)
    sem = np.concatenate(sem_list)
    ins = np.concatenate(ins_list)

    # low-frequency warp so planes are not axis-aligned-perfect (real scans
    # spread a wall over 1-2 voxel layers at 2 cm)
    ph = rng.uniform(0, 2 * np.pi, 3)
    xyz = xyz + 0.015 * np.stack(
        [
            np.sin(1.3 * xyz[:, 1] + ph[0]),
            np.sin(1.1 * xyz[:, 0] + ph[1]),
            np.sin(0.9 * xyz[:, 0] + 0.7 * xyz[:, 1] + ph[2]),
        ],
        axis=1,
    )

    if len(xyz) > max_points:
        keep = rng.choice(len(xyz), max_points, replace=False)
        xyz, sem, ins = xyz[keep], sem[keep], ins[keep]
    # relabel instances contiguous (subsampling may drop a tiny instance)
    valid_ins = ins != IGNORE
    if valid_ins.any():
        uniq = np.unique(ins[valid_ins])
        remap = np.full(uniq.max() + 1, IGNORE, np.int32)
        remap[uniq] = np.arange(len(uniq), dtype=np.int32)
        ins = np.where(valid_ins, remap[np.maximum(ins, 0)], IGNORE)

    # colors: per-instance base color, textured background
    rgb = np.empty((len(xyz), 3), np.float32)
    bg = ins == IGNORE
    rgb[bg] = np.stack(
        [
            np.sin(2.1 * xyz[bg, 0]) * 0.3 + 0.2,
            np.sin(1.7 * xyz[bg, 1]) * 0.3 - 0.1,
            np.cos(1.3 * xyz[bg, 2]) * 0.3,
        ],
        axis=1,
    )
    for ins_id in np.unique(ins[~bg]) if (~bg).any() else []:
        m = ins == ins_id
        # class-anchored base color (+ per-instance jitter): color carries
        # class signal like real furniture categories tend to
        c_id = int(sem[m][0])
        hue = (c_id * 2.399963) % (2 * np.pi)  # golden-angle spacing
        base = 0.6 * np.array([np.cos(hue), np.cos(hue - 2.094), np.cos(hue + 2.094)])
        rgb[m] = base + rng.uniform(-0.25, 0.25, 3)
    rgb += rng.normal(0, 0.05, rgb.shape)
    rgb = np.clip(rgb, -1, 1).astype(np.float32)

    xyz = (xyz - xyz.mean(0, keepdims=True)).astype(np.float32)
    sem, ins = sem.astype(np.int32), ins.astype(np.int32)

    cell = np.floor(xyz / sp_grid).astype(np.int64)
    key = (cell[:, 0] * 73856093) ^ (cell[:, 1] * 19349663) ^ (cell[:, 2] * 83492791)
    # superpoints must not cross instance boundaries: ScanNet's Felzenszwalb
    # mesh segments are boundary-aligned (prepare_data_inst_ScanNetV2.py:153),
    # while a pure spatial grid caps weak-label accuracy at the cell purity
    # (~0.55 on cluttered rooms)
    key = key ^ ((ins.astype(np.int64) + 2) * 2654435761)
    _, superpoint = np.unique(key, return_inverse=True)
    superpoint = superpoint.astype(np.int32)

    edges, edge_feats, sp_sem, sp_ins, sp_offset = build_superpoint_graph(
        xyz, superpoint, sem, ins, seed=seed
    )
    scene = Scene(
        name=f"room_{seed:04d}",
        xyz=xyz,
        rgb=rgb,
        sem=sem,
        ins=ins,
        superpoint=superpoint,
        edges=edges,
        edge_feats=edge_feats,
        sp_sem_gt=sp_sem,
        sp_ins_gt=sp_ins,
        sp_offset_gt=sp_offset,
    )
    scene.validate()
    return scene


def make_scene(
    seed: int = 0,
    num_instances: int = 6,
    points_per_instance: int = 200,
    num_background: int = 800,
    classes: int = 20,
    extent: float = 6.0,
    sp_grid: float = 0.35,
) -> Scene:
    rng = np.random.default_rng(seed)
    xyz_list, rgb_list, sem_list, ins_list = [], [], [], []

    # floor (z≈0) and one wall (y≈0)
    nfloor = num_background // 2
    floor = np.stack(
        [
            rng.uniform(0, extent, nfloor),
            rng.uniform(0, extent, nfloor),
            rng.normal(0, 0.02, nfloor),
        ],
        axis=1,
    )
    xyz_list.append(floor)
    sem_list.append(np.full(nfloor, 1, np.int32))  # floor = class 1
    ins_list.append(np.full(nfloor, IGNORE, np.int32))
    nwall = num_background - nfloor
    wall = np.stack(
        [
            rng.uniform(0, extent, nwall),
            rng.normal(0, 0.02, nwall),
            rng.uniform(0, 2.5, nwall),
        ],
        axis=1,
    )
    xyz_list.append(wall)
    sem_list.append(np.full(nwall, 0, np.int32))  # wall = class 0
    ins_list.append(np.full(nwall, IGNORE, np.int32))
    rgb_list.append(rng.uniform(-1, 1, (num_background, 3)))

    # place instances on a jittered grid so they stay spatially separated
    grid_n = int(np.ceil(np.sqrt(num_instances)))
    pitch = (extent - 1.0) / max(grid_n, 1)
    cells = rng.permutation(grid_n * grid_n)[:num_instances]
    for i in range(num_instances):
        gx, gy = divmod(int(cells[i]), grid_n)
        c = np.array(
            [
                0.5 + (gx + 0.5) * pitch + rng.uniform(-0.1, 0.1),
                0.5 + (gy + 0.5) * pitch + rng.uniform(-0.1, 0.1),
                rng.uniform(0.3, 1.0),
            ]
        )
        size = rng.uniform(0.1, 0.25, 3)
        pts = c + rng.normal(0, 1, (points_per_instance, 3)) * size
        xyz_list.append(pts)
        sem_list.append(np.full(points_per_instance, 2 + (i % (classes - 2)), np.int32))
        ins_list.append(np.full(points_per_instance, i, np.int32))
        color = rng.uniform(-1, 1, 3)
        rgb_list.append(color + rng.normal(0, 0.05, (points_per_instance, 3)))

    xyz = np.concatenate(xyz_list).astype(np.float32)
    rgb = np.clip(np.concatenate(rgb_list), -1, 1).astype(np.float32)
    sem = np.concatenate(sem_list).astype(np.int32)
    ins = np.concatenate(ins_list).astype(np.int32)
    xyz -= xyz.mean(0, keepdims=True)  # .pth files store mean-centered coords

    # superpoints: grid clustering of coordinates, relabelled contiguous
    cell = np.floor(xyz / sp_grid).astype(np.int64)
    key = (cell[:, 0] * 73856093) ^ (cell[:, 1] * 19349663) ^ (cell[:, 2] * 83492791)
    _, superpoint = np.unique(key, return_inverse=True)
    superpoint = superpoint.astype(np.int32)

    edges, edge_feats, sp_sem, sp_ins, sp_offset = build_superpoint_graph(
        xyz, superpoint, sem, ins, seed=seed
    )
    scene = Scene(
        name=f"synthetic_{seed:04d}",
        xyz=xyz,
        rgb=rgb,
        sem=sem,
        ins=ins,
        superpoint=superpoint,
        edges=edges,
        edge_feats=edge_feats,
        sp_sem_gt=sp_sem,
        sp_ins_gt=sp_ins,
        sp_offset_gt=sp_offset,
    )
    scene.validate()
    return scene
