"""Training state container."""
from __future__ import annotations

from typing import Any

import flax.struct

__all__ = ["TrainState"]


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int


def init_train_state(params, batch_stats, tx) -> TrainState:
    return TrainState(params=params, batch_stats=batch_stats, opt_state=tx.init(params), step=0)
