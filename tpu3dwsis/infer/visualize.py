"""Prediction dumps for eyeballing: per-scene instance / semantic PLYs + npz.

The reference ships ``evaluation/visualization/{scannet_vis,s3dis_vis}.py``
(open3d point clouds with one palette color per predicted instance,
``scannet_vis.py:137-186``).  Here the writer is dependency-free: a binary
little-endian PLY with vertex colors, plus an npz with the raw masks so any
downstream tool can re-render without re-running inference.
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["instance_palette", "write_ply_points", "dump_scene_instances"]


def instance_palette(n: int) -> np.ndarray:
    """``[n, 3]`` uint8 of visually-distinct colors (golden-angle hue walk,
    alternating saturation/value rings so neighbors in id-order differ)."""
    h = (np.arange(n) * 0.61803398875) % 1.0
    s = np.where(np.arange(n) % 3 == 1, 0.55, 0.9)
    v = np.where(np.arange(n) % 3 == 2, 0.7, 0.95)
    i = np.floor(h * 6).astype(int)
    f = h * 6 - i
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    table = np.stack(
        [
            np.choose(i % 6, [v, q, p, p, t, v]),
            np.choose(i % 6, [t, v, v, q, p, p]),
            np.choose(i % 6, [p, p, t, v, v, q]),
        ],
        axis=1,
    )
    return (table * 255).astype(np.uint8)


def write_ply_points(path: str, xyz: np.ndarray, rgb: np.ndarray) -> None:
    """Binary little-endian PLY point cloud with uchar colors."""
    n = len(xyz)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.empty(
        n,
        dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
               ("r", "u1"), ("g", "u1"), ("b", "u1")],
    )
    rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    rec["r"], rec["g"], rec["b"] = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())


def dump_scene_instances(
    out_dir: str,
    scene_name: str,
    xyz: np.ndarray,  # [N, 3]
    masks: np.ndarray,  # [K, N] bool
    class_indices: np.ndarray,  # [K]
    confidences: np.ndarray,  # [K]
    point_sem_pred: np.ndarray | None = None,  # [N] predicted class per point
) -> None:
    """Write ``{scene}_inst.ply`` (palette color per instance, gray =
    unassigned), ``{scene}_sem.ply`` (if a semantic prediction is given) and
    ``{scene}.npz`` (bit-packed masks + labels + confidences)."""
    os.makedirs(out_dir, exist_ok=True)
    k = len(masks)
    rgb = np.full((len(xyz), 3), 128, np.uint8)
    if k:
        pal = instance_palette(k)
        order = np.argsort(confidences)  # high-conf instances paint last
        for i in order:
            rgb[masks[i].astype(bool)] = pal[i]
    write_ply_points(os.path.join(out_dir, f"{scene_name}_inst.ply"), xyz, rgb)

    if point_sem_pred is not None:
        nc = int(point_sem_pred.max()) + 1 if len(point_sem_pred) else 1
        pal = instance_palette(max(nc, 1))
        write_ply_points(
            os.path.join(out_dir, f"{scene_name}_sem.ply"),
            xyz,
            pal[np.clip(point_sem_pred, 0, nc - 1)],
        )

    np.savez_compressed(
        os.path.join(out_dir, f"{scene_name}.npz"),
        masks=np.packbits(masks.astype(bool), axis=-1) if k else np.zeros((0, 0), np.uint8),
        n_points=np.int64(len(xyz)),
        class_indices=np.asarray(class_indices, np.int64),
        confidences=np.asarray(confidences, np.float32),
    )
