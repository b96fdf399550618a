"""ScanNet v2 raw-data preparation (reference
``data/ScanNetV2/prepare_data_inst_ScanNetV2.py`` parity).

Per scene: read the ``_vh_clean_2.ply`` mesh + ``.labels.ply`` + the
aggregation/segs jsons, remap the NYU40 ids to the 20-class benchmark set
(``:505-508``), mean-center coords and normalize colors to [-1,1]
(``:107-149``), generate superpoints with Felzenszwalb mesh segmentation
(the reference shells out to the external ``segmentator``; here
:func:`tpu3dwsis.native.felzenszwalb_mesh`), and build the superpoint graph
with mesh-face adjacency (``build_weak_label_graph``, ``:172-285``).
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from .. import native
from ..data.scene import IGNORE, Scene, save_scene
from .graph_build import build_superpoint_graph
from .ply import read_ply

__all__ = ["NYU40_TO_20", "prepare_scene", "prepare_split", "remap_semantic"]

# NYU40 id -> benchmark class index 0..19 (prepare_data_inst_gttxt.py:32)
BENCHMARK_IDS = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39]
NYU40_TO_20 = np.full(41, IGNORE, np.int32)
for _i, _id in enumerate(BENCHMARK_IDS):
    NYU40_TO_20[_id] = _i


def remap_semantic(nyu40_labels: np.ndarray) -> np.ndarray:
    lab = np.clip(nyu40_labels, 0, 40)
    return NYU40_TO_20[lab]


def prepare_scene(
    scan_dir: str,
    scene_name: str,
    out_dir: str,
    kthr: float = 0.01,
    seg_min_verts: int = 20,
    with_labels: bool = True,
    seed: int = 0,
) -> str:
    """Convert one raw ScanNet scan directory into an ``.npz`` Scene."""
    mesh = read_ply(os.path.join(scan_dir, f"{scene_name}_vh_clean_2.ply"))
    v = mesh["vertex"]
    xyz = np.stack([v["x"], v["y"], v["z"]], 1).astype(np.float32)
    rgb = np.stack([v["red"], v["green"], v["blue"]], 1).astype(np.float32)
    rgb = rgb / 127.5 - 1.0  # (:118)
    faces = np.asarray(mesh["face"], np.int32)
    xyz = xyz - xyz.mean(0, keepdims=True)  # (:117)

    superpoint = native.felzenszwalb_mesh(xyz, faces, kthr, seg_min_verts)

    sem = np.full(len(xyz), IGNORE, np.int32)
    ins = np.full(len(xyz), IGNORE, np.int32)
    if with_labels:
        lab_ply = read_ply(os.path.join(scan_dir, f"{scene_name}_vh_clean_2.labels.ply"))
        sem = remap_semantic(np.asarray(lab_ply["vertex"]["label"], np.int64))
        # instances from aggregation json over the official segs
        with open(os.path.join(scan_dir, f"{scene_name}.aggregation.json")) as f:
            agg = json.load(f)
        with open(
            os.path.join(scan_dir, f"{scene_name}_vh_clean_2.0.010000.segs.json")
        ) as f:
            segs = np.asarray(json.load(f)["segIndices"], np.int64)
        inst_id = 0
        for group in agg["segGroups"]:
            mask = np.isin(segs, group["segments"])
            if mask.sum() == 0:
                continue
            sem_vals = sem[mask]
            sem_vals = sem_vals[sem_vals != IGNORE]
            if len(sem_vals) == 0:
                continue
            # wall/floor and unmapped classes carry no instances (:135-143)
            dominant = np.bincount(sem_vals, minlength=20).argmax()
            if dominant in (0, 1):  # wall/floor
                continue
            ins[mask] = inst_id
            inst_id += 1

    edges, edge_feats, sp_sem, sp_ins, sp_offset = build_superpoint_graph(
        xyz, superpoint, sem if with_labels else None, ins if with_labels else None,
        faces=faces, seed=seed,
    )
    scene = Scene(
        name=scene_name, xyz=xyz, rgb=rgb, sem=sem, ins=ins, superpoint=superpoint,
        edges=edges, edge_feats=edge_feats, sp_sem_gt=sp_sem, sp_ins_gt=sp_ins,
        sp_offset_gt=sp_offset,
    )
    scene.validate()
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{scene_name}.npz")
    save_scene(scene, out)
    return out


def prepare_split(scans_root: str, scene_list, out_dir: str, **kw):
    outs = []
    for i, scene_name in enumerate(scene_list):
        outs.append(
            prepare_scene(os.path.join(scans_root, scene_name), scene_name, out_dir, seed=i, **kw)
        )
    return outs
