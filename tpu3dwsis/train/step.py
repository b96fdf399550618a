"""Jitted train / eval / inference step factories.

One traced computation covers voxelization, rulebook build, the full
network, loss, and the optimizer update (the reference splits this across
CPU collate, CUDA extensions and the torch autograd loop —
``train_scannetv2.py:143-252``).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.containers import BatchStatics, SceneBatch
from ..nn.losses import LossConfig, LossFlags, multi_task_loss
from ..nn.network import WSISNet, preprocess
from .state import TrainState

__all__ = ["make_train_step", "make_forward_fn"]


def make_train_step(
    model: WSISNet,
    tx: optax.GradientTransformation,
    statics: BatchStatics,
    loss_cfg: LossConfig,
    flags: LossFlags,
    donate: bool = True,
    jit: bool = True,
):
    """Build the jitted training step for one curriculum stage.

    ``flags`` are static — each stage (and the epoch>joint_training_epoch
    flip inside stage 1) compiles its own step, mirroring the reference's
    config mutation between stages (``train_scannetv2.py:766-784``).
    """

    def step_fn(state: TrainState, batch: SceneBatch) -> Tuple[TrainState, Dict[str, Any]]:
        pre = preprocess(batch, statics, use_coords=model.cfg.use_coords)

        def loss_fn(params):
            outs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                pre,
                train=True,
                mutable=["batch_stats"],
            )
            loss, loss_out = multi_task_loss(outs, batch, loss_cfg, flags)
            return loss, (mutated["batch_stats"], loss_out)

        (loss, (new_bstats, loss_out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_bstats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, loss_out

    if not jit:
        return step_fn
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_forward_fn(model: WSISNet, statics: BatchStatics):
    """Jitted eval-mode forward returning the full output dict (used by
    validation, the propagation passes, and inference)."""

    @jax.jit
    def forward(params, batch_stats, batch: SceneBatch) -> Dict[str, jax.Array]:
        pre = preprocess(batch, statics, use_coords=model.cfg.use_coords)
        outs = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch, pre, train=False
        )
        outs["sp_semantic_softmax"] = jax.nn.softmax(
            outs["sp_semantic_scores"].astype(jnp.float32), axis=-1
        )
        return outs

    return forward
