"""On-device weak-label propagation (stage-2 transition matrices).

The reference computes per-class transition matrices ``T = affinity ∘ (A+I)
∘ gate`` row-normalized and powered on the host in numpy per scene
(``modules/datasets/scannetv2_dataset.py:694-730``).  Those are dense S×S
matmuls — MXU food.  This jitted kernel vmaps the whole per-class loop:
for every class c (padded class set), build the gate, normalize, power the
matrix, take per-column max/argmax over seed rows, then reduce over classes.

Host fallback/reference semantics live in
:meth:`tpu3dwsis.data.weak_labels.WeakLabelStore.propagate`; this device
path produces identical pseudo-label assignments and is used when scenes
fit the padded ``s_max`` bucket.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["propagate_labels_device"]


@functools.partial(jax.jit, static_argnames=("num_classes", "iterations"))
def propagate_labels_device(
    affinity: jax.Array,  # [S, S] float32 (zero-padded)
    adjacency: jax.Array,  # [S, S] float32, WITHOUT self loops
    base_sem: jax.Array,  # [S] int32, -100 unlabeled
    sp_pred: jax.Array,  # [S] int32 predicted class
    sp_value: jax.Array,  # [S] float32 confidence
    valid: jax.Array,  # [S] bool
    num_classes: int,
    iterations: int,
):
    """Returns ``(pseudo_seed, pseudo_score)``: for each superpoint, the seed
    superpoint index whose label propagates to it (argmax over classes and
    seed rows) and the winning score (0 ⇒ no assignment)."""
    s = affinity.shape[0]
    adj = (adjacency + jnp.eye(s, dtype=affinity.dtype)) * valid[None, :] * valid[:, None]

    def per_class(c):
        has_seed = jnp.any((base_sem == c) & valid)
        gate_vec = (sp_pred == c) & (sp_value > 0.7) & valid
        seed = (base_sem == c) & valid
        # reference semantic gate (scannetv2_dataset.py:698-701): rows and
        # columns restricted to confident same-class predictions, plus a
        # diagonal 1 for every (weakly) labeled seed row
        gate = jnp.outer(gate_vec, gate_vec).astype(affinity.dtype)
        gate = jnp.maximum(gate, jnp.diag(seed.astype(affinity.dtype)))

        w = affinity * adj * gate
        d = w.sum(axis=1, keepdims=True)
        d = jnp.where(d == 0, 1.0, d)
        t = w / d

        def body(m, _):
            return m @ t, None

        trans, _ = jax.lax.scan(body, t, None, length=iterations)
        prob = jnp.where(seed[:, None], trans, 0.0)
        score = prob.max(axis=0)
        label = prob.argmax(axis=0)
        score = jnp.where(has_seed, score, 0.0)
        return score, label

    # lax.map (not vmap): keeps peak memory at one S×S transition matrix
    # instead of C of them (S can be thousands).
    scores, labels = jax.lax.map(per_class, jnp.arange(num_classes))  # [C, S]
    best_c = scores.argmax(axis=0)
    idx = jnp.arange(s)
    pseudo_seed = labels[best_c, idx]
    pseudo_score = scores[best_c, idx]
    return pseudo_seed.astype(jnp.int32), pseudo_score
