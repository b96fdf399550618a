"""Batched whole-scene inference must equal per-scene inference (eval mode)."""
import jax
import numpy as np
import pytest

from tpu3dwsis.core.containers import BatchStatics
from tpu3dwsis.data.loader import SceneDataset
from tpu3dwsis.data.synthetic import make_scene
from tpu3dwsis.infer.batched import batched_scene_outputs
from tpu3dwsis.nn.network import NetConfig, WSISNet, preprocess
from tpu3dwsis.train.step import make_forward_fn


def test_batched_vs_single_scene_outputs():
    statics = BatchStatics(
        spatial_shape=(512, 512, 256),
        max_batch=2,
        max_voxels=4096,
        num_levels=2,
        level_sizes=(4096, 2048),
        max_points=4096,
        max_superpoints=2048,
        max_edges=16384,
        max_instances=16,
    )
    scenes = [
        make_scene(seed=s, num_instances=3, points_per_instance=100, num_background=300)
        for s in range(2)
    ]
    ds = SceneDataset(scenes, statics)
    model = WSISNet(NetConfig(classes=20, media=16, blocks=2))

    rng = np.random.default_rng(0)
    arrays = ds.collate_batch([0], rng, training=False)
    from tpu3dwsis.data.collate import to_scene_batch

    b0 = to_scene_batch(arrays)
    pre = preprocess(b0, statics)
    variables = model.init(jax.random.PRNGKey(0), b0, pre, train=False)
    forward = make_forward_fn(model, statics)

    # batched (2 scenes per forward)
    batched = {
        scene.name: outs
        for scene, outs in batched_scene_outputs(
            forward, variables["params"], variables["batch_stats"], ds, 2, rng
        )
    }
    # per-scene
    single = {
        scene.name: outs
        for scene, outs in batched_scene_outputs(
            forward, variables["params"], variables["batch_stats"], ds, 1, rng
        )
    }
    for name in batched:
        for key in ["semantic_scores", "sp_semantic_scores", "pred_sp_offset_vectors"]:
            np.testing.assert_allclose(
                batched[name][key], single[name][key], rtol=2e-4, atol=2e-4,
            )
        # edge endpoints rebased per scene
        s = [sc for sc in scenes if sc.name == name][0]
        assert batched[name]["edge_u"].max() < s.num_superpoints
