"""S3DIS raw-data preparation with cut-pursuit superpoints.

Reference pipeline (``data/S3DIS/partition/partition_S3DIS.py:81-115`` +
``prepare_S3DIS_inst_data.py:101-224``):

1. read a room's ``Annotations/*.txt`` object files (xyz + rgb per line,
   class from the filename prefix), concatenate into the room cloud with
   per-object instance ids;
2. voxel-prune at 3 cm keeping the point→voxel map (``libply_c.prune``);
3. 10-NN adjacency graph on the pruned cloud (``graphs.py:26-84``);
4. 45-NN geometric features (``libply_c.compute_geof``);
5. L0 cut-pursuit on [geof, rgb/255*2-1...] with reg 0.03 (``libcp``) →
   superpoints, mapped back to the full cloud via the prune map;
6. superpoint graph with 10-NN edges + 13-d edge features.

All native pieces come from :mod:`tpu3dwsis.native`.
"""
from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np

from .. import native
from ..data.scene import Scene, save_scene
from .graph_build import build_superpoint_graph

__all__ = ["S3DIS_CLASSES", "prepare_room", "compute_superpoints"]

S3DIS_CLASSES = [
    "ceiling", "floor", "wall", "beam", "column", "window", "door", "chair",
    "table", "bookcase", "sofa", "board", "clutter",
]
_CLASS_OF = {c: i for i, c in enumerate(S3DIS_CLASSES)}


def _voxel_prune(xyz: np.ndarray, voxel: float):
    """3 cm voxel dedup keeping point→voxel map (``libply_c.prune`` with the
    3D-WSIS modification that returns the map, ``data/S3DIS/S3DIS.md:5-11``)."""
    key = np.floor(xyz / voxel).astype(np.int64)
    flat = (key[:, 0] * 73856093) ^ (key[:, 1] * 19349663) ^ (key[:, 2] * 83492791)
    uniq, p2v = np.unique(flat, return_inverse=True)
    s = len(uniq)
    cent = np.zeros((s, 3))
    cnt = np.bincount(p2v, minlength=s).astype(np.float64)
    for d in range(3):
        cent[:, d] = np.bincount(p2v, weights=xyz[:, d], minlength=s) / cnt
    return cent.astype(np.float32), p2v.astype(np.int32)


def compute_superpoints(
    xyz: np.ndarray,
    rgb: np.ndarray,
    voxel: float = 0.03,
    knn_adj: int = 10,
    knn_geof: int = 45,
    reg: float = 0.03,
) -> np.ndarray:
    """Cut-pursuit superpoints for a room; returns per-point ids."""
    pruned, p2v = _voxel_prune(xyz, voxel)
    rgb_p = np.zeros((len(pruned), 3), np.float32)
    cnt = np.bincount(p2v, minlength=len(pruned)).astype(np.float32)
    for d in range(3):
        rgb_p[:, d] = np.bincount(p2v, weights=rgb[:, d], minlength=len(pruned)) / cnt

    nbr = native.knn_graph(pruned, knn_adj, cell=max(voxel * 3, 0.09))
    eu = np.repeat(np.arange(len(pruned), dtype=np.int32), nbr.shape[1])
    ev = nbr.reshape(-1)
    ok = ev >= 0
    eu, ev = eu[ok], ev[ok].astype(np.int32)
    ew = np.ones(len(eu), np.float32)

    geof = native.compute_geof(pruned, k=knn_geof, cell=max(voxel * 3, 0.09))
    feat = np.concatenate([geof, rgb_p / 2.0], axis=1).astype(np.float32)
    comp = native.cut_pursuit_l0(feat, eu, ev, ew, reg=reg, max_iter=10)
    sp = comp[p2v]
    _, sp = np.unique(sp, return_inverse=True)
    return sp.astype(np.int32)


def prepare_room(room_dir: str, out_dir: str, seed: int = 0) -> Optional[str]:
    """Convert one raw S3DIS room (``Area_X/room/Annotations/*.txt``)."""
    ann = sorted(glob.glob(os.path.join(room_dir, "Annotations", "*.txt")))
    if not ann:
        return None
    xyz_list, rgb_list, sem_list, ins_list = [], [], [], []
    inst = 0
    for path in ann:
        cls_name = os.path.basename(path).split("_")[0]
        cls = _CLASS_OF.get(cls_name, _CLASS_OF["clutter"])
        arr = np.loadtxt(path, dtype=np.float32)
        if arr.ndim == 1:
            arr = arr[None]
        xyz_list.append(arr[:, :3])
        rgb_list.append(arr[:, 3:6] / 127.5 - 1.0)
        sem_list.append(np.full(len(arr), cls, np.int32))
        ins_list.append(np.full(len(arr), inst, np.int32))
        inst += 1
    xyz = np.concatenate(xyz_list)
    rgb = np.concatenate(rgb_list).astype(np.float32)
    sem = np.concatenate(sem_list)
    ins = np.concatenate(ins_list)
    xyz = (xyz - xyz.mean(0, keepdims=True)).astype(np.float32)

    superpoint = compute_superpoints(xyz, (rgb + 1.0) * 127.5)
    edges, edge_feats, sp_sem, sp_ins, sp_offset = build_superpoint_graph(
        xyz, superpoint, sem, ins, seed=seed
    )
    area_room = "_".join(os.path.normpath(room_dir).split(os.sep)[-2:])
    scene = Scene(
        name=area_room, xyz=xyz, rgb=rgb, sem=sem, ins=ins, superpoint=superpoint,
        edges=edges, edge_feats=edge_feats, sp_sem_gt=sp_sem, sp_ins_gt=sp_ins,
        sp_offset_gt=sp_offset,
    )
    scene.validate()
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{area_room}.npz")
    save_scene(scene, out)
    return out
