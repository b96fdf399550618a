"""Device mesh + sharding for data-parallel training.

TPU-native replacement for the reference's (vestigial) DDP scaffolding
(``train_scannetv2.py:734-738``, ``utils/comm.py``): instead of NCCL
process groups, a ``jax.sharding.Mesh`` over all chips with GSPMD
partitioning — batch arrays sharded on their leading (point/superpoint/
edge/voxel) axis, parameters replicated, XLA inserting the ICI collectives
(the all-reduce of gradients that DDP does, plus the cross-shard segment
reductions sync-BN needs, fall out of the sharding propagation
automatically).

``shard_batch`` shards any array whose leading axis divides evenly by the
mesh; everything else is replicated.  Batch statistics in
:class:`tpu3dwsis.nn.norm.MaskedBatchNorm` are computed with global
reductions over the sharded voxel axis, which under GSPMD *is* SyncBatchNorm
semantics.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "world_size", "process_rank"]

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(tree, mesh: Mesh):
    """device_put a pytree with leading-axis sharding where divisible."""
    n = mesh.devices.size
    sharded = NamedSharding(mesh, P(DATA_AXIS))
    replicated = NamedSharding(mesh, P())

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] >= n:
            return jax.device_put(x, sharded)
        return jax.device_put(x, replicated)

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))


# ---- comm.py-parity helpers (utils/comm.py:23-296) -------------------------

def world_size() -> int:
    return jax.process_count()


def process_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0
