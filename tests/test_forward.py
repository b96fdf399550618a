"""End-to-end forward + loss smoke test on a tiny synthetic batch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu3dwsis.core.containers import BatchStatics, SceneBatch
from tpu3dwsis.data.collate import SceneLabels, collate, to_scene_batch
from tpu3dwsis.data.scene import IGNORE
from tpu3dwsis.data.synthetic import make_scene
from tpu3dwsis.nn.losses import LossConfig, LossFlags, multi_task_loss
from tpu3dwsis.nn.network import NetConfig, WSISNet, preprocess


def tiny_statics():
    return BatchStatics(
        spatial_shape=(512, 512, 256),
        max_batch=2,
        max_voxels=4096,
        num_levels=3,
        level_sizes=(4096, 2048, 1024),
        max_points=4096,
        max_superpoints=2048,
        max_edges=16384,
        max_instances=16,
    )


def gt_labels(scene):
    return SceneLabels(
        point_sem=scene.sem,
        point_ins=scene.ins,
        sp_sem=scene.sp_sem_gt,
        sp_ins=scene.sp_ins_gt,
        sp_offset=scene.sp_offset_gt,
        sp_occupancy=np.ones(scene.num_superpoints, np.float32) * 10,
        sp_size=np.ones(scene.num_superpoints, np.float32),
    )


@pytest.fixture(scope="module")
def batch_and_statics():
    scenes = [make_scene(seed=s, num_instances=4, points_per_instance=120, num_background=400) for s in range(2)]
    statics = tiny_statics()
    rng = np.random.default_rng(0)
    arrays = collate([*scenes], [gt_labels(s) for s in scenes], statics, rng, training=True)
    return to_scene_batch(arrays), statics, arrays


def test_collate_invariants(batch_and_statics):
    batch, statics, arrays = batch_and_statics
    n_valid = arrays["point_valid"].sum()
    assert n_valid > 0
    # valid points have in-range coords and superpoints
    pv = arrays["point_valid"]
    assert arrays["point_coords"][pv].min() >= 0
    assert (arrays["point_sp"][pv] < statics.max_superpoints).all()
    sv = arrays["sp_valid"]
    ev = arrays["edge_valid"]
    assert (arrays["edge_u"][ev] < statics.max_superpoints).all()
    # every valid edge endpoint is a valid superpoint
    assert sv[arrays["edge_u"][ev]].all() and sv[arrays["edge_v"][ev]].all()
    # scene-local instance ids within range
    assert arrays["sp_ins_local"].max() < statics.max_instances


def test_forward_and_loss(batch_and_statics):
    batch, statics, _ = batch_and_statics
    cfg = NetConfig(classes=20, blocks=3)
    model = WSISNet(cfg)
    pre = preprocess(batch, statics, use_coords=True)
    variables = model.init(jax.random.PRNGKey(0), batch, pre, train=False)

    outs, mutated = model.apply(
        variables, batch, pre, train=True, mutable=["batch_stats"]
    )
    n, s = batch.num_points, batch.num_superpoints
    assert outs["semantic_scores"].shape == (n, 20)
    assert outs["sp_semantic_scores"].shape == (s, 20)
    assert outs["pred_sp_offset_vectors"].shape == (s, 3)
    assert outs["pred_sp_occupancy"].shape == (s,)
    assert outs["sp_discriminative_feats"].shape == (s, 7)
    for k, v in outs.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite output {k}"

    # edge affinity sums to 1 over each valid source superpoint's edges
    aff = np.asarray(outs["edge_affinity"])
    eu = np.asarray(batch.edge_u)
    ev_mask = np.asarray(batch.edge_valid)
    sums = np.zeros(s + 1)
    np.add.at(sums, eu, aff)
    for u in np.unique(eu[ev_mask])[:20]:
        np.testing.assert_allclose(sums[u], 1.0, rtol=1e-3)

    lcfg = LossConfig(classes=20, max_instances=statics.max_instances, num_scenes=statics.max_batch)
    for flags in [
        LossFlags(False, False, False),
        LossFlags(True, True, True),
    ]:
        loss, out = multi_task_loss(outs, batch, lcfg, flags)
        assert np.isfinite(float(loss)), f"loss not finite for {flags}"
        assert float(loss) > 0


def test_gradients_flow(batch_and_statics):
    batch, statics, _ = batch_and_statics
    cfg = NetConfig(classes=20, blocks=3)
    model = WSISNet(cfg)
    pre = preprocess(batch, statics, use_coords=True)
    variables = model.init(jax.random.PRNGKey(0), batch, pre, train=False)
    params = variables["params"]
    lcfg = LossConfig(classes=20, max_instances=statics.max_instances, num_scenes=statics.max_batch)
    flags = LossFlags(True, True, True)

    def loss_fn(p):
        outs, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            batch,
            pre,
            train=True,
            mutable=["batch_stats"],
        )
        loss, _ = multi_task_loss(outs, batch, lcfg, flags)
        return loss

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # every major submodule receives some gradient
    def tree_norm(v):
        return float(
            sum(jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(v)) ** 0.5
        )

    gnorms = {k: tree_norm(v) for k, v in grads.items()}
    for key in ["unet", "ecc", "point_sem", "sp_sem", "sp_offset", "feature_term", "w_qs"]:
        assert gnorms.get(key, 0.0) > 0.0, f"no gradient into {key}: {gnorms}"
