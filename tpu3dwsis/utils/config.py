"""Config system: YAML files with ``_base_`` inheritance, ``_delete_``
markers, attribute access, and dotted CLI overrides.

Functional parity with the reference's vendored mmcv-style ``Config``
(``utils/config.py:21-120``): ``Config.fromfile`` resolves ``_base_``
recursively (later files override earlier), ``_delete_`` replaces instead of
merging, and ``merge_from_options`` applies ``key.subkey=value`` overrides
with literal-eval typing (the reference's ``DictAction``).
"""
from __future__ import annotations

import ast
import copy
import os
from typing import Any, Dict, Mapping, Sequence

import yaml

__all__ = ["ConfigDict", "Config"]

DELETE_KEY = "_delete_"
BASE_KEY = "_base_"


class ConfigDict(dict):
    """dict with attribute access (addict-lite)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    @staticmethod
    def wrap(obj):
        if isinstance(obj, Mapping):
            return ConfigDict({k: ConfigDict.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [ConfigDict.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> Dict[str, Any]:
        def unwrap(o):
            if isinstance(o, Mapping):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)


def _merge(base: Dict, new: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in new.items():
        if isinstance(v, Mapping) and v.get(DELETE_KEY, False):
            v = {kk: vv for kk, vv in v.items() if kk != DELETE_KEY}
            out[k] = copy.deepcopy(v)
        elif isinstance(v, Mapping) and isinstance(out.get(k), Mapping):
            out[k] = _merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


class Config:
    @staticmethod
    def fromfile(path: str) -> ConfigDict:
        path = os.path.abspath(path)
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        bases = data.pop(BASE_KEY, [])
        if isinstance(bases, str):
            bases = [bases]
        merged: Dict[str, Any] = {}
        for b in bases:
            base_cfg = Config.fromfile(os.path.join(os.path.dirname(path), b))
            merged = _merge(merged, base_cfg.to_dict())
        merged = _merge(merged, data)
        return ConfigDict.wrap(merged)

    @staticmethod
    def merge_from_options(cfg: ConfigDict, options: Sequence[str]) -> ConfigDict:
        """Apply ``a.b.c=value`` overrides (reference ``DictAction`` +
        ``merge_cfg_and_args``)."""
        for opt in options:
            key, _, raw = opt.partition("=")
            if not _:
                raise ValueError(f"override '{opt}' is not of the form key=value")
            try:
                value = ast.literal_eval(raw)
            except (ValueError, SyntaxError):
                value = raw
            node = cfg
            parts = key.split(".")
            for p in parts[:-1]:
                if p not in node or not isinstance(node[p], Mapping):
                    node[p] = ConfigDict()
                node = node[p]
            node[parts[-1]] = ConfigDict.wrap(value)
        return cfg
