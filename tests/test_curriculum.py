"""Mini end-to-end curriculum: all 3 stages + propagation + checkpointing."""
import os

import jax
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


def _make_world(log_dir: str, save_freq: int = 100, stage2_rounds=(1,)):
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
        stage2_rounds=stage2_rounds,
        stage3_epochs=1,
        save_freq=save_freq,
        eval_freq=1000,
        log_dir=log_dir,
    )
    return model, statics, ds, cfg, store


def test_resume_fast_forward(tmp_path):
    """Kill-and-resume mid-stage-2 must equal the uninterrupted run: same
    final weights, step counts and weak-label stats, and the earlier stages
    must NOT be replayed (VERDICT round-1 missing #3; reference resume:
    train_scannetv2.py:673-693)."""
    model, statics, ds, cfg, store = _make_world(str(tmp_path / "a"), save_freq=1,
                                                 stage2_rounds=(2,))
    ta = Trainer(model, statics, ds, cfg)
    ta.run()

    # fresh world, resumed from the mid-stage-2 checkpoint (round0 ep 1 of 2)
    model2, statics2, ds2, cfg2, store2 = _make_world(str(tmp_path / "b"), save_freq=1,
                                                      stage2_rounds=(2,))
    tb = Trainer(model2, statics2, ds2, cfg2)
    # the production resume path: abstract (eval_shape) template, zero
    # device work before the checkpoint overwrites every value
    tb.init_state(abstract=True)
    ckpt = os.path.join(cfg.log_dir, "epoch_00001_round0")
    assert os.path.isfile(ckpt + ".npz")  # fast single-file format
    tb.state, meta = load_checkpoint(ckpt, tb.state, ds2.weak_store)
    assert meta["stage"] == "round0" and int(meta["epoch"]) == 1
    tb.apply_resume_meta(meta)
    tb.run(resume_meta=meta)

    # no replay of completed work
    assert {h["stage"] for h in tb.history} == {"round0", "whole_scene"}
    assert all(not (h["stage"] == "round0" and h["epoch"] == 1) for h in tb.history)
    # exact continuation
    assert tb.global_step == ta.global_step
    assert int(np.asarray(tb.state.step)) == int(np.asarray(ta.state.step))
    for a, b in zip(
        jax.tree_util.tree_leaves(ta.state.params), jax.tree_util.tree_leaves(tb.state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)
    assert store.label_stats() == store2.label_stats()


def test_resume_at_stage_boundary(tmp_path):
    """A checkpoint written at the END of a stage resumes into the next
    stage (and runs its pre-stage propagation pass)."""
    model, statics, ds, cfg, store = _make_world(str(tmp_path / "c"))
    t = Trainer(model, statics, ds, cfg)
    plan = t.stage_list()
    names = [s.name for s, _ in plan]
    assert names == ["semantic", "round0", "whole_scene"]
    # simulated meta: stage-1 complete
    t.init_state()
    ran = []
    t.train_stage = lambda stage, start_epoch=1, keep_opt=False, **kw: ran.append(
        (stage.name, start_epoch, keep_opt)
    )
    t.propagation_pass = lambda ind: ran.append(("prop", ind))
    t.whole_scene_pass = lambda: ran.append(("whole",))
    t.run(resume_meta={"stage": "semantic", "epoch": cfg.stage1_epochs})
    assert ran == [
        ("prop", 0),
        ("round0", 1, False),
        ("whole",),
        ("whole_scene", 1, False),
    ]


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


def test_deadline_slice_banks_and_resumes(tmp_path):
    """Bounded-slice contract (round-4): a deadline in the past stops the
    run after epoch 1 WITH a checkpoint on disk; a compact f16 bank
    (save_checkpoint(bank=True), no opt_state) restores in a fresh world
    with _opt_reset and the curriculum completes without replaying the
    banked epoch."""
    import json
    import time

    from tpu3dwsis.train.checkpoint import save_checkpoint
    from tpu3dwsis.train.curriculum import DeadlineReached

    model, statics, ds, cfg, store = _make_world(str(tmp_path / "a"))
    cfg.deadline_ts = time.time() - 1.0
    t = Trainer(model, statics, ds, cfg)
    with pytest.raises(DeadlineReached) as ei:
        t.run()
    assert (ei.value.stage, ei.value.epoch) == ("semantic", 1)
    ck = os.path.join(cfg.log_dir, "epoch_00001_semantic.npz")
    assert os.path.isfile(ck)

    bank = str(tmp_path / "bank")
    save_checkpoint(
        bank, t.state,
        {"epoch": 1, "stage": "semantic", "global_step": t.global_step,
         "rng_state": json.dumps(t.rng.bit_generator.state)},
        store, bank=True,
    )
    assert os.path.getsize(bank + ".npz") < os.path.getsize(ck)

    model2, statics2, ds2, cfg2, store2 = _make_world(str(tmp_path / "b"))
    tb = Trainer(model2, statics2, ds2, cfg2)
    tb.init_state(abstract=True)  # bank restore needs only the template
    tb.state, meta = load_checkpoint(bank + ".npz", tb.state, ds2.weak_store)
    assert meta.get("_opt_reset") is True
    # f16 bank restored to template dtypes, values close to the live state
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(t.state.params)),
        jax.tree_util.tree_leaves(jax.device_get(tb.state.params)),
    ):
        assert np.asarray(b).dtype == np.asarray(a).dtype
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-3, atol=2e-3,
        )
    tb.apply_resume_meta(meta)
    tb.run(resume_meta=meta)
    assert {h["stage"] for h in tb.history} == {"semantic", "round0", "whole_scene"}
    assert all(not (h["stage"] == "semantic" and h["epoch"] == 1) for h in tb.history)


def test_release_marker_staleness_window(tmp_path, monkeypatch):
    """Only a FRESH /tmp/tpu_release marker (a live bench re-touches it every
    15 s) preempts a trainer; a leftover from a dead bench must not abort
    every later run on the machine (code-review r5 finding)."""
    import time as _time

    from tpu3dwsis.train import curriculum as cur

    marker = tmp_path / "tpu_release"
    monkeypatch.setattr(cur, "RELEASE_MARKER", str(marker))
    assert not cur._release_requested()  # absent
    marker.write_text("123")
    assert cur._release_requested()  # fresh
    old = _time.time() - 3600
    import os as _os

    _os.utime(marker, (old, old))
    assert not cur._release_requested()  # stale leftover
