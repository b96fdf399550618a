"""Multi-host launch + global-batch assembly.

The reference's multi-node story is torch.distributed scaffolding that is
never actually initialized (SURVEY §2.3: no ``init_process_group`` exists;
``utils/comm.py`` + the DDP wrap at ``train_scannetv2.py:734-738`` are the
API surface).  Here multi-host is one call: :func:`initialize` wires
``jax.distributed`` (TPU pods auto-discover coordinates; explicit
coordinator args cover CPU/GPU clusters), after which ``jax.devices()``
spans all hosts and the GSPMD path shards globally.

Data flow per host (the DistributedSampler equivalent, TPU-native):

1. every host fits bucket capacities on the FULL scene list (identical
   statics everywhere — shapes participate in jit cache keys, so they must
   agree across processes);
2. :func:`host_scene_shard` slices the scene list round-robin by
   ``jax.process_index()``, padded by wrap-around so every host yields the
   same number of batches per epoch (torch's ``DistributedSampler`` pads the
   same way — unequal step counts would deadlock the collectives);
3. each host collates its ``batch_size / process_count`` scenes locally,
   :func:`rebase_arrays` shifts every index-valued field into this host's
   slot of the global index space, and :func:`global_batch` assembles the
   global ``jax.Array`` batch from the per-process shards
   (``jax.make_array_from_process_local_data``) over a mesh whose device
   order is process-contiguous.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np

from ..core.containers import BatchStatics, SceneBatch
from ..data.scene import IGNORE

__all__ = [
    "initialize",
    "host_scene_shard",
    "scale_statics",
    "rebase_arrays",
    "global_batch",
]


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
    """This host's slice of the dataset (round-robin across processes),
    wrap-around padded so all hosts hold the same count."""
    pi = jax.process_index() if process_index is None else process_index
    k = jax.process_count()
    per_host = (len(scenes) + k - 1) // k
    return [scenes[(pi + i * k) % len(scenes)] for i in range(per_host)]


def scale_statics(statics: BatchStatics, k: int) -> BatchStatics:
    """Global-batch capacities: ``k`` per-host shards concatenated."""
    return statics._replace(
        max_batch=statics.max_batch * k,
        max_voxels=statics.max_voxels * k,
        level_sizes=tuple(s * k for s in statics.level_sizes),
        max_points=statics.max_points * k,
        max_superpoints=statics.max_superpoints * k,
        max_edges=statics.max_edges * k,
    )


def rebase_arrays(
    arrays: Dict[str, np.ndarray], statics: BatchStatics, host: int, k: int
) -> Dict[str, np.ndarray]:
    """Shift a host-local collate output into slot ``host`` of the global
    index space (the cross-host analogue of collate's own per-scene
    re-basing, ``data/collate.py:253,276``).  Null-slot markers (== local
    capacity) become the global null slot (== global capacity)."""
    S, B = statics.max_superpoints, statics.max_batch
    imax = statics.max_instances
    out = dict(arrays)

    def shift(v, null_local, null_global, delta):
        return np.where(v == null_local, null_global, v + delta).astype(v.dtype)

    pc = out["point_coords"].copy()
    pc[:, 0] += host * B
    out["point_coords"] = pc
    out["point_sp"] = shift(out["point_sp"], S, k * S, host * S)
    out["sp_scene"] = shift(out["sp_scene"], B, k * B, host * B)
    out["edge_u"] = shift(out["edge_u"], S, k * S, host * S)
    out["edge_v"] = shift(out["edge_v"], S, k * S, host * S)
    # global instance ids only need distinctness across hosts (losses key on
    # sp_scene + sp_ins_local); each scene holds <= imax instances
    ins_delta = host * B * imax
    for key in ("point_ins", "sp_ins"):
        v = out[key]
        out[key] = np.where(v == IGNORE, IGNORE, v + ins_delta).astype(v.dtype)
    return out


def global_batch(
    arrays: Dict[str, np.ndarray],
    mesh,
    statics: BatchStatics,
    process_index: Optional[int] = None,
) -> SceneBatch:
    """Assemble the global SceneBatch from this host's collate output.

    ``mesh`` must enumerate devices process-contiguously (``jax.devices()``
    order) so host ``p``'s rows land in block ``p`` of the leading axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    k = jax.process_count()
    pi = jax.process_index() if process_index is None else process_index
    if k > 1:
        # rebasing is only correct if host p's rows land in block p: the mesh
        # must enumerate devices process-contiguously in process order.  A
        # violation would silently scramble the cross-host index rebasing.
        procs = [d.process_index for d in mesh.devices.flat]
        starts = [procs.index(p) for p in sorted(set(procs))]
        assert procs == sorted(procs) and starts == sorted(starts), (
            f"mesh device order is not process-contiguous: {procs}"
        )
    local = rebase_arrays(arrays, statics, pi, k)
    sharding = NamedSharding(mesh, P("data"))

    def put(v):
        v = np.ascontiguousarray(v)
        gshape = (v.shape[0] * k,) + v.shape[1:]
        return jax.make_array_from_process_local_data(sharding, v, gshape)

    # every field is required; a missing one is a collate bug and must
    # KeyError here rather than a shape error in the forward
    return SceneBatch(**{f: put(local[f]) for f in SceneBatch._fields})
