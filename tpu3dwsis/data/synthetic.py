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

__all__ = ["make_scene"]


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
