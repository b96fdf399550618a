"""ScanNet v2 dataset: conversion from reference-prepared ``.pth`` files and
loading of this framework's ``.npz`` scene files.

The reference pipeline stores per-scene tuples ``(coords, colors, sem, inst,
superpoint, scene_name)`` (``prepare_data_inst_ScanNetV2.py:159-167``) plus
igraph pickles for the superpoint graph.  We convert the ``.pth`` tuples
directly (torch CPU load) and rebuild the graph with
:mod:`tpu3dwsis.prep.graph_build` — no igraph dependency; the graph is
equivalent by construction (mesh faces are not stored in the .pth, so
contact adjacency substitutes for face adjacency; pass ``faces`` in
:func:`convert_pth_scene` when converting from raw ScanNet meshes).
"""
from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np

from ..prep.graph_build import build_superpoint_graph
from .scene import Scene, load_scene, save_scene

__all__ = ["convert_pth_scene", "convert_pth_split", "load_split", "SCANNET_NUM_CLASSES"]

SCANNET_NUM_CLASSES = 20


def convert_pth_scene(pth_path: str, out_dir: str, faces: Optional[np.ndarray] = None, seed: int = 0) -> str:
    """Convert one reference ``.pth`` scene into an ``.npz`` Scene."""
    import torch

    coords, colors, sem, inst, superpoint, scene_name = torch.load(
        pth_path, map_location="cpu", weights_only=False
    )
    coords = np.asarray(coords, np.float32)
    colors = np.asarray(colors, np.float32)
    sem = np.asarray(sem, np.int32).reshape(-1)
    inst = np.asarray(inst, np.int32).reshape(-1)
    superpoint = np.asarray(superpoint, np.int64)
    # re-base superpoints to contiguous ids (prep guarantees this already)
    _, superpoint = np.unique(superpoint, return_inverse=True)
    superpoint = superpoint.astype(np.int32)

    edges, edge_feats, sp_sem, sp_ins, sp_offset = build_superpoint_graph(
        coords, superpoint, sem, inst, faces=faces, seed=seed
    )
    scene = Scene(
        name=str(scene_name),
        xyz=coords,
        rgb=colors,
        sem=sem,
        ins=inst,
        superpoint=superpoint,
        edges=edges,
        edge_feats=edge_feats,
        sp_sem_gt=sp_sem,
        sp_ins_gt=sp_ins,
        sp_offset_gt=sp_offset,
    )
    scene.validate()
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{scene_name}.npz")
    save_scene(scene, out)
    return out


def convert_pth_split(pth_dir: str, out_dir: str) -> List[str]:
    outs = []
    for i, p in enumerate(sorted(glob.glob(os.path.join(pth_dir, "*.pth")))):
        outs.append(convert_pth_scene(p, out_dir, seed=i))
    return outs


def load_split(npz_dir: str, limit: Optional[int] = None) -> List[Scene]:
    files = sorted(glob.glob(os.path.join(npz_dir, "*.npz")))
    if limit:
        files = files[:limit]
    return [load_scene(f) for f in files]
