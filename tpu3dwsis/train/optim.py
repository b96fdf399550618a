"""Optimizer: AdamW + per-epoch PolyLR + ECC gradient clamping.

Matches the reference training recipe:

* AdamW(lr=1e-3, weight_decay=1e-4) over trainable params
  (``train_scannetv2.py:94``, ``config/ScanNet_v2_3D_WSIS.yaml:58-60``);
* PolyLR ``lr * (1 - epoch/max_iters)^power`` with ``power=0.9``, stepped
  **per epoch** (``utils/lr_scheduler.py:6-42``, ``train_scannetv2.py:269``),
  optional ``constant_ending`` floor;
* elementwise clamp of the ECC submodule's gradients to ``[-1, 1]``
  (``train_scannetv2.py:247-249``).

The reference re-creates the optimizer at every curriculum stage
(``do_train`` entry) — callers here do the same by calling
:func:`make_optimizer` per stage.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

__all__ = ["poly_lr_schedule", "make_optimizer"]


def poly_lr_schedule(
    base_lr: float,
    max_epochs: int,
    steps_per_epoch: int,
    power: float = 0.9,
    constant_ending: float = 0.0,
) -> Callable:
    """Per-epoch polynomial decay (``PolyLR``, ``utils/lr_scheduler.py:6-42``)."""

    def schedule(step):
        epoch = step // steps_per_epoch
        frac = jnp.clip(epoch / max_epochs, 0.0, 1.0)
        lr = base_lr * (1.0 - frac) ** power
        if constant_ending > 0:
            lr = jnp.maximum(lr, base_lr * constant_ending)
        return lr

    return schedule


def _ecc_mask(params) -> object:
    """Pytree mask selecting the ECC submodule (grad clamp scope,
    ``train_scannetv2.py:247-249``)."""
    return {k: jax.tree_util.tree_map(lambda _: k == "ecc", v) for k, v in params.items()}


def make_optimizer(
    params,
    base_lr: float = 1e-3,
    weight_decay: float = 1e-4,
    max_epochs: int = 200,
    steps_per_epoch: int = 1,
    power: float = 0.9,
    constant_ending: float = 0.0,
) -> optax.GradientTransformation:
    schedule = poly_lr_schedule(base_lr, max_epochs, steps_per_epoch, power, constant_ending)
    return optax.chain(
        optax.masked(
            optax.clip(1.0),  # elementwise grad clamp on ECC params
            _ecc_mask(params),
        ),
        optax.adamw(learning_rate=schedule, weight_decay=weight_decay),
    )
