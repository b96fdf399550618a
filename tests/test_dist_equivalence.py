"""Sharded (8-device GSPMD) forward/loss must equal the single-device result."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu3dwsis.core.containers import BatchStatics
from tpu3dwsis.data.collate import SceneLabels, collate, to_scene_batch
from tpu3dwsis.data.synthetic import make_scene
from tpu3dwsis.dist.mesh import make_mesh, shard_batch
from tpu3dwsis.nn.losses import LossConfig, LossFlags, multi_task_loss
from tpu3dwsis.nn.network import NetConfig, WSISNet, preprocess


def test_sharded_loss_matches_single_device():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    statics = BatchStatics(
        spatial_shape=(512, 512, 256),
        max_batch=2,
        max_voxels=2048,
        num_levels=2,
        level_sizes=(2048, 1024),
        max_points=2048,
        max_superpoints=512,
        max_edges=4096,
        max_instances=8,
    )
    scenes = [
        make_scene(seed=s, num_instances=3, points_per_instance=80, num_background=250)
        for s in range(2)
    ]
    labels = [
        SceneLabels(sc.sem, sc.ins, sc.sp_sem_gt, sc.sp_ins_gt, sc.sp_offset_gt)
        for sc in scenes
    ]
    arrays = collate(scenes, labels, statics, np.random.default_rng(0), training=True)
    batch = to_scene_batch(arrays)
    model = WSISNet(NetConfig(classes=20, media=16, blocks=2))
    pre = preprocess(batch, statics)
    variables = model.init(jax.random.PRNGKey(0), batch, pre, train=False)
    lcfg = LossConfig(classes=20, max_instances=8, num_scenes=2)
    flags = LossFlags(True, True, False)

    def loss_of(batch):
        pre = preprocess(batch, statics)
        outs = model.apply(variables, batch, pre, train=False)
        loss, _ = multi_task_loss(outs, batch, lcfg, flags)
        return loss

    single = float(jax.jit(loss_of)(batch))

    mesh = make_mesh(8)
    sharded_batch = shard_batch(batch, mesh)
    vars_rep = jax.device_put(variables, NamedSharding(mesh, P()))

    def loss_sharded(batch):
        pre = preprocess(batch, statics)
        outs = model.apply(vars_rep, batch, pre, train=False)
        loss, _ = multi_task_loss(outs, batch, lcfg, flags)
        return loss

    sharded = float(jax.jit(loss_sharded, out_shardings=NamedSharding(mesh, P()))(sharded_batch))
    np.testing.assert_allclose(sharded, single, rtol=2e-5)
