"""verify drive (round 4): end-to-end against the installed package, CPU.

Full 3-stage curriculum on tiny synthetic scenes (weak-label acquire ->
train -> propagation rounds -> whole-scene -> validate), then this
session's changed path: a deadline-bounded slice (DeadlineReached) banked
to a compressed f16 checkpoint (save_checkpoint(bank=True)), restored in a
fresh world with an optimizer reset + schedule fast-forward, and resumed
to completion — final weak-label stats must match shape expectations.
"""
import json
import os
import tempfile
import time

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from tpu3dwsis.core.containers import BatchStatics
from tpu3dwsis.data.loader import SceneDataset
from tpu3dwsis.data.synthetic import make_scene
from tpu3dwsis.data.weak_labels import WeakLabelStore
from tpu3dwsis.nn.network import NetConfig, WSISNet
from tpu3dwsis.train.checkpoint import load_checkpoint, save_checkpoint
from tpu3dwsis.train.curriculum import CurriculumConfig, DeadlineReached, Trainer


def make_world(log_dir, deadline_ts=None):
    statics = BatchStatics(
        spatial_shape=(512, 512, 256), max_batch=2, max_voxels=2048,
        num_levels=2, level_sizes=(2048, 1024), max_points=2048,
        max_superpoints=1024, max_edges=8192, max_instances=8,
    )
    scenes = [
        make_scene(seed=s, num_instances=3, points_per_instance=100, num_background=300)
        for s in range(2)
    ]
    val = [make_scene(seed=9, num_instances=3, points_per_instance=100, num_background=300)]
    store = WeakLabelStore({s.name: s for s in scenes}, classes=20)
    store.acquire(np.random.default_rng(0))
    ds = SceneDataset(scenes, statics, weak_store=store)
    val_ds = SceneDataset(val, statics)
    model = WSISNet(NetConfig(classes=20, media=16, blocks=2))
    cfg = CurriculumConfig(
        batch_size=2, stage1_epochs=3, joint_training_epoch=1,
        stage2_rounds=(1,), stage3_epochs=1, save_freq=100, eval_freq=1000,
        log_dir=log_dir, deadline_ts=deadline_ts,
    )
    return model, statics, ds, cfg, store, val_ds


tmp = tempfile.mkdtemp()

# ---- 1. uninterrupted full curriculum --------------------------------------
model, statics, ds, cfg, store, val_ds = make_world(os.path.join(tmp, "a"))
stats0 = store.label_stats()
print("acquire:", stats0)
assert 0 < stats0["sem_coverage"] < 0.5 and stats0["sem_accuracy"] > 0.75, stats0
t = Trainer(model, statics, ds, cfg, val_dataset=val_ds)
t.run()
stats1 = store.label_stats()
print("after curriculum:", stats1)
assert stats1["sem_coverage"] > stats0["sem_coverage"], (stats0, stats1)
sem = [h["loss"] for h in t.history if h["stage"] == "semantic"]
# epoch 1 runs semantic-only flags; joint losses switch on at epoch 2
# (joint_training_epoch=1), so compare within the joint phase
assert sem[-1] < sem[1], sem
val = t.validate()
print("validate:", val)
assert all(np.isfinite(v) for v in val.values()), val

# ---- 2. deadline slice: stops after epoch 1, checkpoints, banks ------------
model, statics, ds, cfg, store, val_ds = make_world(
    os.path.join(tmp, "b"), deadline_ts=time.time() - 1.0
)
tb = Trainer(model, statics, ds, cfg)
try:
    tb.run()
    raise SystemExit("FAIL: deadline did not fire")
except DeadlineReached as exc:
    d_stage, d_epoch = exc.stage, exc.epoch
    print(f"deadline fired at stage {d_stage} epoch {d_epoch}")
    assert d_stage == "semantic" and d_epoch == 1, (d_stage, d_epoch)
ck = os.path.join(cfg.log_dir, "epoch_00001_semantic.npz")
assert os.path.isfile(ck), os.listdir(cfg.log_dir)
bank = os.path.join(tmp, "bank_resume")
save_checkpoint(
    bank, tb.state,
    {"epoch": d_epoch, "stage": d_stage, "global_step": tb.global_step,
     "process_count": 1, "rng_state": json.dumps(tb.rng.bit_generator.state)},
    store, bank=True,
)
sz = os.path.getsize(bank + ".npz") / 2**20
full_sz = os.path.getsize(ck) / 2**20
print(f"bank {sz:.2f} MiB vs full checkpoint {full_sz:.2f} MiB")
assert sz < full_sz, (sz, full_sz)

# ---- 3. fresh world resumes from the bank and completes --------------------
model2, statics2, ds2, cfg2, store2, _ = make_world(os.path.join(tmp, "c"))
tc = Trainer(model2, statics2, ds2, cfg2)
tc.init_state()
tc.state, meta = load_checkpoint(bank + ".npz", tc.state, ds2.weak_store)
assert meta.get("_opt_reset") is True and meta["stage"] == "semantic", meta
# f16 bank restored to the template's dtypes, values close to the live state
for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(tb.state.params)),
                jax.tree_util.tree_leaves(jax.device_get(tc.state.params))):
    assert np.asarray(b).dtype == np.asarray(a).dtype
    np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                               rtol=2e-3, atol=2e-3)
tc.apply_resume_meta(meta)
tc.run(resume_meta=meta)
assert {h["stage"] for h in tc.history} >= {"semantic", "round0", "whole_scene"}, tc.history
# no replay of the banked epoch
assert all(not (h["stage"] == "semantic" and h["epoch"] == 1) for h in tc.history)
stats2 = store2.label_stats()
print("after bank-resume curriculum:", stats2)
assert stats2["sem_coverage"] > stats0["sem_coverage"], (stats0, stats2)
print("DRIVE OK")
