"""Checkpointing: model/optimizer state *and* the weak-label curriculum
state.

The reference checkpoints model+optimizer+scheduler with SIGINT masking
(``utils/checkpoint.py:199-269``) but silently loses the propagated
weak-label graphs on resume (SURVEY §5.4). Here the
:class:`WeakLabelStore` arrays are part of the checkpoint payload, so
mid-curriculum resume is exact.

Two on-disk formats:

* **fast ``.npz``** (single-process default): one bulk ``jax.device_get``,
  leaves packed into a single uncompressed npz next to a pickled tree
  skeleton, atomic rename.  Orbax/tensorstore's chunked commit measured
  **2030 s for 161 MiB** on this 1-core VM (``.prop_r3_s6.log``); the npz
  path writes the same payload in seconds.
* **orbax** (multi-process saves, and loading of legacy checkpoints):
  required when arrays are not fully addressable from one host.
"""
from __future__ import annotations

import os
import pickle
import re
import signal
import time
from contextlib import contextmanager
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..data.weak_labels import WeakLabelStore
from .state import TrainState

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]


class _LeafRef:
    """Placeholder for an externalized array leaf in the pickled skeleton."""

    __slots__ = ("idx",)

    def __init__(self, idx: int):
        self.idx = idx

    def __getstate__(self):
        return self.idx

    def __setstate__(self, idx):
        self.idx = idx


def _fast_save(path: str, payload, compress: bool = False) -> None:
    """Single-file npz checkpoint: bulk device_get, atomic rename."""
    t0 = time.monotonic()
    payload = jax.device_get(payload)
    leaves, treedef = jax.tree_util.tree_flatten(payload)
    arrays: Dict[str, np.ndarray] = {}
    skeleton_leaves = []
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, (np.ndarray, np.generic)):
            arrays[f"leaf_{i}"] = np.asarray(leaf)
            skeleton_leaves.append(_LeafRef(i))
        else:  # python scalars / strings stay inside the skeleton
            skeleton_leaves.append(leaf)
    skeleton = jax.tree_util.tree_unflatten(treedef, skeleton_leaves)
    blob = pickle.dumps(skeleton, protocol=pickle.HIGHEST_PROTOCOL)
    arrays["__skeleton__"] = np.frombuffer(blob, np.uint8)
    final = path if path.endswith(".npz") else path + ".npz"
    tmp = final + ".tmp.npz"
    (np.savez_compressed if compress else np.savez)(tmp, **arrays)
    os.replace(tmp, final)
    mb = os.path.getsize(final) / 2**20
    print(
        f"# checkpoint: saved {final} ({mb:.1f} MiB) in "
        f"{time.monotonic() - t0:.1f}s",
        flush=True,
    )


def _fast_load(path: str):
    final = path if path.endswith(".npz") else path + ".npz"
    with np.load(final, allow_pickle=False) as z:
        skeleton = pickle.loads(z["__skeleton__"].tobytes())
        leaves, treedef = jax.tree_util.tree_flatten(skeleton)
        out = [
            z[f"leaf_{l.idx}"] if isinstance(l, _LeafRef) else l for l in leaves
        ]
    return jax.tree_util.tree_unflatten(treedef, out)


def _is_npz(path: str) -> bool:
    return os.path.isfile(path if path.endswith(".npz") else path + ".npz")


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
    bank: bool = False,
):
    """``bank=True`` writes a compact *resume bank*: params cast to float16,
    optimizer state dropped, compressed npz.  Banks are small enough to
    commit to git (the only storage that survives a container recycle);
    :func:`load_checkpoint` restores them with ``meta["_opt_reset"]`` set so
    the caller re-creates the optimizer and fast-forwards its schedule."""
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "meta": dict(meta),
    }
    if bank:
        del payload["opt_state"]
        payload["meta"]["banked"] = True
        payload["params"] = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float16)
            if np.asarray(a).dtype == np.float32 else np.asarray(a),
            jax.device_get(payload["params"]),
        )
    if weak_store is not None:
        payload["weak"] = weak_store.state_to_arrays()
    with _delayed_interrupt():
        if jax.process_count() == 1:
            _fast_save(os.path.abspath(path), payload, compress=bank)
        else:
            import orbax.checkpoint as ocp

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
    if _is_npz(path):
        payload = _fast_load(os.path.abspath(path))
        if weak_store is not None and "weak" in payload:
            weak_store.state_from_arrays(payload["weak"])
        meta = dict(payload.get("meta", {}))
        if "opt_state" not in payload:
            # resume bank (see save_checkpoint(bank=True)): the optimizer
            # state was dropped to keep the file git-bankable.  Keep the
            # template's opt_state as a placeholder and flag the reset so
            # the trainer re-creates tx and fast-forwards its schedule.
            if state is None:
                raise ValueError(
                    f"{path} is a resume bank (no opt_state); a template "
                    "TrainState is required to restore it"
                )
            payload["opt_state"] = state.opt_state
            meta["_opt_reset"] = True
        params = payload["params"]
        if meta.get("banked") and state is not None:
            # f16-banked params back to the model's parameter dtypes
            params = jax.tree_util.tree_map(
                lambda tmpl, a: np.asarray(a, np.asarray(tmpl).dtype),
                jax.device_get(state.params), params,
            )
        new_state = TrainState(
            params=params,
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            step=payload["step"],
        )
        if state is not None:
            new_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(state),
                jax.tree_util.tree_leaves(new_state),
            )
        return new_state, meta

    import orbax.checkpoint as ocp

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
    if _is_npz(path):
        payload = _fast_load(os.path.abspath(path))
        if "weak" not in payload:
            return False
        weak_store.state_from_arrays(payload["weak"])
        return True

    import orbax.checkpoint as ocp

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
        # sidecars hold this host's own shard — host-local numpy, so the
        # fast path is always safe regardless of process count
        _fast_save(
            os.path.abspath(f"{ckpt_path}_weak{rank}"),
            {"weak": weak_store.state_to_arrays()},
        )


def load_weak_sidecar(ckpt_path: str, rank: int, weak_store: WeakLabelStore):
    side = f"{ckpt_path}_weak{rank}"
    if _is_npz(side):
        payload = _fast_load(os.path.abspath(side))
        weak_store.state_from_arrays(payload["weak"])
        return

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(os.path.abspath(side))
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
        if re.match(r"epoch_\d{5}_", d)
        and not re.search(r"_weak\d+(\.npz)?$", d)
        and not d.endswith(".tmp.npz")
    ]
    if not cands:
        return None
    return max(cands, key=os.path.getmtime)  # most recent, across stages
