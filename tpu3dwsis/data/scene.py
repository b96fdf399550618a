"""Host-side scene record and serialization.

One `Scene` holds what the reference keeps per scan: the ``<scene>.pth``
tuple ``(coords, colors, sem, inst, superpoint, scene)`` produced by data
prep (``data/ScanNetV2/prepare_data_inst_ScanNetV2.py:159-167``) plus the
superpoint graph the reference pickles as ``<scene>_spg.dat`` (an igraph; we
store flat numpy arrays instead — no igraph dependency).

Ground-truth per-superpoint attributes (mode semantic/instance label, offset
to instance center) mirror the vertex attributes of the reference graph
(``prepare_data_inst_ScanNetV2.py:268-282``).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

__all__ = ["Scene", "save_scene", "load_scene"]

IGNORE = -100


@dataclasses.dataclass
class Scene:
    name: str
    xyz: np.ndarray  # [n, 3] float32 metric coords (mean-centered like the .pth)
    rgb: np.ndarray  # [n, 3] float32 colors in [-1, 1]
    sem: np.ndarray  # [n] int32 GT semantic, -100 ignore
    ins: np.ndarray  # [n] int32 GT instance, -100 ignore
    superpoint: np.ndarray  # [n] int32 superpoint id, contiguous from 0

    # superpoint graph (directed edges u->v, both directions present)
    edges: np.ndarray  # [e, 2] int32
    edge_feats: np.ndarray  # [e, 13] float32, standardized
    sp_sem_gt: np.ndarray  # [s] int32 mode semantic per superpoint
    sp_ins_gt: np.ndarray  # [s] int32 mode instance per superpoint
    sp_offset_gt: np.ndarray  # [s, 3] float32 instance-center offset

    @property
    def num_points(self) -> int:
        return len(self.xyz)

    @property
    def num_superpoints(self) -> int:
        return int(self.superpoint.max()) + 1 if len(self.superpoint) else 0

    @property
    def num_edges(self) -> int:
        return len(self.edges)

    def validate(self):
        n = self.num_points
        assert self.rgb.shape == (n, 3) and self.sem.shape == (n,) and self.ins.shape == (n,)
        s = self.num_superpoints
        # contiguity assert mirrors prepare_data_inst_ScanNetV2.py:180
        assert len(np.unique(self.superpoint)) == s, "superpoint ids must be contiguous"
        assert self.sp_sem_gt.shape == (s,) and self.sp_offset_gt.shape == (s, 3)
        if len(self.edges):
            assert self.edges.max() < s
            assert self.edge_feats.shape == (len(self.edges), 13)


def save_scene(scene: Scene, path: str | Path):
    np.savez_compressed(
        path,
        name=np.asarray(scene.name),
        **{f.name: getattr(scene, f.name) for f in dataclasses.fields(scene) if f.name != "name"},
    )


def load_scene(path: str | Path) -> Scene:
    z = np.load(path, allow_pickle=False)
    return Scene(name=str(z["name"]), **{k: z[k] for k in z.files if k != "name"})
