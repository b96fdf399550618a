"""Mini end-to-end curriculum: all 3 stages + propagation + checkpointing."""
import os

import numpy as np
import pytest

from tpu3dwsis.core.containers import BatchStatics
from tpu3dwsis.data.loader import SceneDataset
from tpu3dwsis.data.synthetic import make_scene
from tpu3dwsis.data.weak_labels import WeakLabelStore
from tpu3dwsis.nn.network import NetConfig, WSISNet
from tpu3dwsis.train.checkpoint import latest_checkpoint, load_checkpoint
from tpu3dwsis.train.curriculum import CurriculumConfig, Trainer


@pytest.fixture(scope="module")
def tiny_world(tmp_path_factory):
    statics = BatchStatics(
        spatial_shape=(512, 512, 256),
        max_batch=2,
        max_voxels=2048,
        num_levels=2,
        level_sizes=(2048, 1024),
        max_points=2048,
        max_superpoints=1024,
        max_edges=8192,
        max_instances=8,
    )
    scenes = [
        make_scene(seed=s, num_instances=3, points_per_instance=100, num_background=300)
        for s in range(2)
    ]
    store = WeakLabelStore({s.name: s for s in scenes}, classes=20)
    store.acquire(np.random.default_rng(0))
    ds = SceneDataset(scenes, statics, weak_store=store)
    model = WSISNet(NetConfig(classes=20, media=16, blocks=2))
    cfg = CurriculumConfig(
        batch_size=2,
        stage1_epochs=2,
        joint_training_epoch=1,
        stage2_rounds=(1,),
        stage3_epochs=1,
        save_freq=100,
        eval_freq=1000,
        log_dir=str(tmp_path_factory.mktemp("log")),
    )
    return model, statics, ds, cfg, store


def test_full_curriculum_runs(tiny_world):
    model, statics, ds, cfg, store = tiny_world
    trainer = Trainer(model, statics, ds, cfg)
    trainer.run()
    # history spans all stages
    stages = {h["stage"] for h in trainer.history}
    assert stages == {"semantic", "round0", "whole_scene"}
    assert all(np.isfinite(h["loss"]) for h in trainer.history)
    # propagation expanded coverage beyond the initial weak labels
    stats = store.label_stats()
    assert stats["sem_coverage"] > 0.0
    # stage-3 occupancy/size signals were materialized
    st = next(iter(store.states.values()))
    assert st.cur_occupancy.max() > 0
    # checkpoints written at stage ends, incl. weak state
    ckpt = latest_checkpoint(cfg.log_dir)
    assert ckpt is not None
    state2, meta = load_checkpoint(ckpt, state=trainer.state, weak_store=store)
    assert meta["stage"] == "whole_scene"
    leaf0 = next(iter(np.asarray(x) for x in [state2.step]))
    assert int(leaf0) == trainer.state.step
