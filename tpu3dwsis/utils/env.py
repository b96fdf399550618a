"""Seeding + environment info (reference ``utils/env.py:60-174``)."""
from __future__ import annotations

import platform
import random
from typing import Dict

import numpy as np

__all__ = ["set_random_seed", "collect_env_info"]


def set_random_seed(seed: int):
    """Seed python/numpy (jax randomness is explicit-key; per-scene PRNG
    streams derive from this seed via ``np.random.default_rng``)."""
    random.seed(seed)
    np.random.seed(seed)


def collect_env_info() -> Dict[str, str]:
    info = {
        "python": platform.python_version(),
        "platform": platform.platform(),
        "numpy": np.__version__,
    }
    try:
        import jax

        info["jax"] = jax.__version__
        info["devices"] = ", ".join(str(d) for d in jax.devices())
    except Exception as e:  # pragma: no cover
        info["jax"] = f"unavailable: {e}"
    return info
