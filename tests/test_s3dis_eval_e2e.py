"""S3DIS evaluation protocol end-to-end on synthetic 13-class scenes."""
import jax
import numpy as np

from tpu3dwsis.core.containers import BatchStatics
from tpu3dwsis.data.loader import SceneDataset
from tpu3dwsis.data.synthetic import make_scene
from tpu3dwsis.infer.cli import evaluate_dataset
from tpu3dwsis.nn.network import NetConfig, WSISNet, preprocess


def test_evaluate_dataset_s3dis_protocol():
    statics = BatchStatics(
        spatial_shape=(512, 512, 256),
        max_batch=1,
        max_voxels=2048,
        num_levels=2,
        level_sizes=(2048, 1024),
        max_points=2048,
        max_superpoints=1024,
        max_edges=8192,
        max_instances=8,
    )
    scenes = [
        make_scene(seed=s, num_instances=3, points_per_instance=80, num_background=300, classes=13)
        for s in range(2)
    ]
    ds = SceneDataset(scenes, statics)
    model = WSISNet(NetConfig(classes=13, media=16, blocks=2))

    from tpu3dwsis.data.collate import to_scene_batch

    rng = np.random.default_rng(0)
    arrays = ds.collate_batch([0], rng, training=False)
    b0 = to_scene_batch(arrays)
    pre = preprocess(b0, statics)
    variables = model.init(jax.random.PRNGKey(0), b0, pre, train=False)

    import tempfile

    with tempfile.TemporaryDirectory() as dump_dir:
        metrics = evaluate_dataset(
            model,
            variables["params"],
            variables["batch_stats"],
            ds,
            dataset_kind="s3dis",
            dump_dir=dump_dir,
        )
        for key in ["point_miou", "mAP", "mAP50", "mAP25", "prec50", "rec50",
                    "mCov", "mWCov", "mPrec", "mRec"]:
            assert key in metrics, f"missing {key}: {metrics}"
            v = metrics[key]
            assert v != v or np.isfinite(v)  # nan allowed (untrained), inf not

        # prediction dumps written and loadable (visualize.py)
        import os

        for scene in scenes:
            dump = np.load(os.path.join(dump_dir, f"{scene.name}.npz"))
            k = len(dump["class_indices"])
            assert dump["confidences"].shape == (k,)
            if k:
                masks = np.unpackbits(dump["masks"], axis=-1)[:, : int(dump["n_points"])]
                assert masks.shape == (k, scene.num_points)
            ply = os.path.join(dump_dir, f"{scene.name}_inst.ply")
            with open(ply, "rb") as f:
                head = f.read(200).decode("ascii", "ignore")
            assert f"element vertex {scene.num_points}" in head
