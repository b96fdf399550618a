"""Checkpointing (orbax): model/optimizer state *and* the weak-label
curriculum state.

The reference checkpoints model+optimizer+scheduler with SIGINT masking
(``utils/checkpoint.py:199-269``) but silently loses the propagated
weak-label graphs on resume (SURVEY §5.4). Here the
:class:`WeakLabelStore` arrays are part of the checkpoint payload, so
mid-curriculum resume is exact.
"""
from __future__ import annotations

import os
import re
import signal
from contextlib import contextmanager
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..data.weak_labels import WeakLabelStore
from .state import TrainState

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]


@contextmanager
def _delayed_interrupt():
    """Mask SIGINT during save (``utils/checkpoint.py:199-213``)."""
    received = []
    try:
        old = signal.signal(signal.SIGINT, lambda s, f: received.append((s, f)))
        installed = True
    except ValueError:  # not main thread
        installed = False
    try:
        yield
    finally:
        if installed:
            signal.signal(signal.SIGINT, old)
            if received:
                old(*received[0])


def save_checkpoint(
    path: str,
    state: TrainState,
    meta: Dict[str, Any],
    weak_store: Optional[WeakLabelStore] = None,
):
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "meta": dict(meta),
    }
    if weak_store is not None:
        payload["weak"] = weak_store.state_to_arrays()
    with _delayed_interrupt():
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), payload, force=True)


def load_checkpoint(
    path: str,
    state: Optional[TrainState] = None,
    weak_store: Optional[WeakLabelStore] = None,
):
    """Restore a checkpoint; returns ``(TrainState, meta)``.

    If ``state`` is given, its pytree structure guides dtype/sharding
    restoration; otherwise raw arrays are returned. If ``weak_store`` is
    given, its per-scene state is restored in place.
    """
    ckptr = ocp.PyTreeCheckpointer()
    if state is None:
        # no template: restore to host numpy (works regardless of the
        # platform/sharding the checkpoint was written under)
        from orbax.checkpoint._src.metadata import value as ocp_value

        meta = ckptr.metadata(os.path.abspath(path))

        def _ra(m):
            # arrays -> host numpy; scalars/strings keep their native types
            if isinstance(m, (ocp_value.ScalarMetadata, ocp_value.StringMetadata)):
                return ocp.RestoreArgs()
            return ocp.RestoreArgs(restore_type=np.ndarray)

        restore_args = jax.tree_util.tree_map(_ra, meta.item_metadata)
        payload = ckptr.restore(
            os.path.abspath(path), restore_args=restore_args
        )
    else:
        payload = ckptr.restore(os.path.abspath(path))
    if weak_store is not None and "weak" in payload:
        weak_store.state_from_arrays(
            {
                name: {k: np.asarray(v) for k, v in d.items()}
                for name, d in payload["weak"].items()
            }
        )
    new_state = TrainState(
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=payload["opt_state"],
        step=payload["step"],
    )
    if state is not None:
        # re-adopt the reference structure (e.g. tuples vs lists in opt_state)
        new_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(state),
            jax.tree_util.tree_leaves(new_state),
        )
    return new_state, payload.get("meta", {})


def load_weak_from_checkpoint(path: str, weak_store: WeakLabelStore) -> bool:
    """Restore only the weak-label state from a main checkpoint (used when
    the caller must inspect ``meta`` — e.g. the saved process topology —
    before deciding whether the stored shard is meaningful)."""
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(os.path.abspath(path))
    if "weak" not in payload:
        return False
    weak_store.state_from_arrays(
        {
            name: {k: np.asarray(v) for k, v in d.items()}
            for name, d in payload["weak"].items()
        }
    )
    return True


def save_weak_sidecar(ckpt_path: str, rank: int, weak_store: WeakLabelStore):
    """Non-main hosts persist their scene shard's weak-label state next to
    the main checkpoint (each host trains a disjoint scene shard in
    multi-host mode, so the curriculum state is per-host)."""
    with _delayed_interrupt():
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(
            os.path.abspath(f"{ckpt_path}_weak{rank}"),
            {"weak": weak_store.state_to_arrays()},
            force=True,
        )


def load_weak_sidecar(ckpt_path: str, rank: int, weak_store: WeakLabelStore):
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(os.path.abspath(f"{ckpt_path}_weak{rank}"))
    weak_store.state_from_arrays(
        {
            name: {k: np.asarray(v) for k, v in d.items()}
            for name, d in payload["weak"].items()
        }
    )


def latest_checkpoint(log_dir: str) -> Optional[str]:
    """Find the newest ``epoch_XXXXX_<stage>`` checkpoint directory
    (reference globbing semantics, ``train_scannetv2.py:673-693``)."""
    if not os.path.isdir(log_dir):
        return None
    cands = [
        os.path.join(log_dir, d)
        for d in os.listdir(log_dir)
        if re.match(r"epoch_\d{5}_", d) and not re.search(r"_weak\d+$", d)
    ]
    if not cands:
        return None
    return max(cands, key=os.path.getmtime)  # most recent, across stages
