"""File IO handler registry + source backup (reference ``utils/io.py:6-30``,
``utils/backup.py``)."""
from __future__ import annotations

import json
import os
import pickle
import shutil
from typing import Any, Callable, Dict

import numpy as np
import yaml

__all__ = ["load", "dump", "register_handler", "backup_source"]

_LOADERS: Dict[str, Callable] = {}
_DUMPERS: Dict[str, Callable] = {}


def register_handler(ext: str, loader: Callable, dumper: Callable):
    _LOADERS[ext] = loader
    _DUMPERS[ext] = dumper


register_handler(
    "json", lambda f: json.load(open(f)), lambda o, f: json.dump(o, open(f, "w"), indent=2)
)
register_handler(
    "yaml", lambda f: yaml.safe_load(open(f)), lambda o, f: yaml.safe_dump(o, open(f, "w"))
)
register_handler("yml", _LOADERS["yaml"], _DUMPERS["yaml"])
register_handler(
    "pkl", lambda f: pickle.load(open(f, "rb")), lambda o, f: pickle.dump(o, open(f, "wb"))
)
register_handler("npz", lambda f: dict(np.load(f)), lambda o, f: np.savez_compressed(f, **o))


def _ext(path: str) -> str:
    return os.path.splitext(path)[1].lstrip(".").lower()


def load(path: str) -> Any:
    return _LOADERS[_ext(path)](path)


def dump(obj: Any, path: str):
    _DUMPERS[_ext(path)](obj, path)


def backup_source(src_root: str, dst_dir: str, exts=(".py", ".yaml", ".cpp", ".md")):
    """Snapshot the source tree into the log dir (reference ``utils/backup.py``)."""
    os.makedirs(dst_dir, exist_ok=True)
    for root, dirs, files in os.walk(src_root):
        dirs[:] = [d for d in dirs if not d.startswith(".") and d not in ("__pycache__", "log")]
        for f in files:
            if os.path.splitext(f)[1] in exts:
                src = os.path.join(root, f)
                rel = os.path.relpath(src, src_root)
                dst = os.path.join(dst_dir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.copy2(src, dst)
