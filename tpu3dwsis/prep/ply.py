"""Minimal PLY reader (ascii + binary_little_endian), numpy-only.

Replaces the reference's ``plyfile`` dependency for reading ScanNet
``*_vh_clean_2.ply`` meshes and label PLYs
(``prepare_data_inst_ScanNetV2.py:96-149``).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["read_ply"]

_TYPES = {
    "char": "i1", "uchar": "u1", "int8": "i1", "uint8": "u1",
    "short": "i2", "ushort": "u2", "int16": "i2", "uint16": "u2",
    "int": "i4", "uint": "u4", "int32": "i4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Returns a dict of element name → structured array ('vertex', 'face').

    List properties (e.g. face vertex_indices) become fixed-width arrays
    when uniform (the ScanNet meshes are all triangles).
    """
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype, is_list, count_type)])
        while True:
            line = f.readline().strip().decode()
            if line == "end_header":
                break
            parts = line.split()
            if not parts or parts[0] == "comment":
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elements.append((parts[1], int(parts[2]), []))
            elif parts[0] == "property":
                if parts[1] == "list":
                    elements[-1][2].append((parts[4], _TYPES[parts[3]], True, _TYPES[parts[2]]))
                else:
                    elements[-1][2].append((parts[2], _TYPES[parts[1]], False, None))

        out: Dict[str, np.ndarray] = {}
        if fmt == "ascii":
            for name, count, props in elements:
                rows = [f.readline().split() for _ in range(count)]
                if any(p[2] for p in props):
                    # assume single list property (faces)
                    data = []
                    for r in rows:
                        k = int(r[0])
                        data.append([int(x) for x in r[1 : 1 + k]])
                    out[name] = np.asarray(data)
                else:
                    arr = np.asarray(rows, dtype=np.float64)
                    dt = np.dtype([(p[0], p[1]) for p in props])
                    rec = np.zeros(count, dt)
                    for i, p in enumerate(props):
                        rec[p[0]] = arr[:, i].astype(p[1])
                    out[name] = rec
        elif fmt == "binary_little_endian":
            for name, count, props in elements:
                if any(p[2] for p in props):
                    # list property: read row by row (ScanNet faces: uchar + 3 ints)
                    lists = []
                    scalars = [p for p in props if not p[2]]
                    if scalars:
                        raise NotImplementedError("mixed list+scalar PLY element")
                    lp = props[0]
                    cnt_dt = np.dtype("<" + lp[3])
                    val_dt = np.dtype("<" + lp[1])
                    for _ in range(count):
                        k = int(np.frombuffer(f.read(cnt_dt.itemsize), cnt_dt)[0])
                        lists.append(np.frombuffer(f.read(val_dt.itemsize * k), val_dt))
                    out[name] = np.asarray(lists)
                else:
                    dt = np.dtype([(p[0], "<" + p[1]) for p in props])
                    out[name] = np.frombuffer(f.read(dt.itemsize * count), dt)
        else:
            raise NotImplementedError(f"PLY format {fmt}")
    return out
