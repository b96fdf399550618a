"""Multi-host launch helper.

The reference's multi-node story is torch.distributed scaffolding that is
never actually initialized (SURVEY §2.3: no ``init_process_group`` exists).
Here multi-host is one call: ``initialize()`` wires
``jax.distributed`` (TPU pods auto-discover coordinates; explicit
coordinator args cover CPU/GPU clusters), after which ``jax.devices()``
spans all hosts and the existing ``make_mesh``/GSPMD path shards globally.

Per-host data: each process feeds its own scene shard —
:func:`host_scene_shard` slices a scene list round-robin by
``jax.process_index()`` (the DistributedSampler equivalent).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax

__all__ = ["initialize", "host_scene_shard"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Idempotent ``jax.distributed.initialize`` wrapper."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def host_scene_shard(scenes: Sequence, process_index: Optional[int] = None) -> list:
    """This host's slice of the dataset (round-robin across processes)."""
    pi = jax.process_index() if process_index is None else process_index
    return list(scenes[pi :: jax.process_count()])
