"""Round-5 verify drive: end-to-end against the installed package, CPU.

acquire -> 3-stage curriculum (tiny) -> validate -> whole-scene inference
on a held-out scene -> cluster -> instance AP + semantic evaluators, plus
this session's changed surface: bench.py's chip-claim handoff
(_wait_for_chip must leave the pidfile owned by the bench process).
"""
import os
import tempfile

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from tpu3dwsis.core.containers import BatchStatics
from tpu3dwsis.data.loader import SceneDataset
from tpu3dwsis.data.synthetic import make_scene
from tpu3dwsis.data.weak_labels import WeakLabelStore
from tpu3dwsis.nn.network import NetConfig, WSISNet
from tpu3dwsis.train.curriculum import CurriculumConfig, Trainer
from tpu3dwsis.infer.batched import batched_scene_outputs
from tpu3dwsis.infer.clustering import cluster_scene
from tpu3dwsis.eval.instance_ap import InstanceAPEvaluator, encode_gt_instances
from tpu3dwsis.eval.semantic import SemanticEvaluator

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
stats0 = store.label_stats()
print("acquire:", stats0)
assert 0.0 < stats0["sem_coverage"] < 0.5 and stats0["sem_accuracy"] > 0.75, stats0

ds = SceneDataset(scenes, statics, weak_store=store)
val_ds = SceneDataset(val, statics)
model = WSISNet(NetConfig(classes=20, media=16, blocks=2))
cfg = CurriculumConfig(
    batch_size=2, stage1_epochs=3, joint_training_epoch=1,
    stage2_rounds=(1,), stage3_epochs=1, save_freq=100, eval_freq=1000,
    log_dir=tempfile.mkdtemp(),
)
t = Trainer(model, statics, ds, cfg, val_dataset=val_ds)
t.run()
stats1 = store.label_stats()
print("after curriculum:", stats1)
assert stats1["sem_coverage"] > stats0["sem_coverage"], (stats0, stats1)
sem = [h["loss"] for h in t.history if h["stage"] == "semantic"]
assert sem[-1] < sem[1], sem
v = t.validate()
print("validate:", v)
assert v and all(np.isfinite(x) for x in v.values()), v

# ---- held-out whole-scene inference -> clustering -> evaluators -----------
class_ids = list(range(1, 21))
class_labels = [f"c{i}" for i in class_ids]
ap_ev = InstanceAPEvaluator(class_ids, class_labels)
sem_ev = SemanticEvaluator(class_labels)
rng = np.random.default_rng(1)
for scene, outs in batched_scene_outputs(t.forward, t.state.params,
                                         t.state.batch_stats, val_ds, 1, rng):
    s = scene.num_superpoints
    res = cluster_scene(
        scene.xyz, scene.superpoint, scene.edges,
        np.asarray(outs["sp_semantic_scores"].argmax(-1))[:s],
        np.asarray(outs["pred_sp_offset_vectors"])[:s],
        np.asarray(outs["pred_sp_occupancy"])[:s],
        np.asarray(outs["pred_sp_ins_size"])[:s],
        valid_class_mask=[True] * 20,
    )
    print("instances:", len(res.confidences))
    sem_ids = np.arange(1, 21)
    gt = encode_gt_instances(sem_ids[np.clip(scene.sem, 0, 19)], scene.ins)
    ap_ev.process(scene.name, res.masks, sem_ids[res.class_indices],
                  res.confidences, gt)
    sem_ev.process(np.asarray(outs["semantic_scores"].argmax(-1))[: scene.num_points],
                   scene.sem)
ap = ap_ev.evaluate()
sm = sem_ev.evaluate()
print("AP:", {k: ap[k] for k in ("all_ap", "all_ap_50", "all_ap_25")})
print("mIoU:", sm["miou"])
assert np.isfinite(float(sm["miou"])), sm

# ---- bench chip-claim handoff (changed this session) -----------------------
# Exercise bench._wait_for_chip and the tpu_snap_run guard against FAKE
# marker paths (the real /tmp/tpu_release would preempt the live trainer).
import importlib.util
import subprocess

fake_pid = "/tmp/vf_tpu_job.pid"
fake_rel = "/tmp/vf_tpu_release"
src = open("/root/repo/bench.py").read()
assert '"/tmp/tpu_job.pid"' in src and '"/tmp/tpu_release"' in src, (
    "bench.py marker literals moved; refusing to run against the REAL chip markers")
src = src.replace('"/tmp/tpu_job.pid"', repr(fake_pid)).replace(
    '"/tmp/tpu_release"', repr(fake_rel))
open("/tmp/vf_bench.py", "w").write(src)
spec = importlib.util.spec_from_file_location("vf_bench", "/tmp/vf_bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
for p in (fake_pid, fake_rel):
    if os.path.exists(p):
        os.remove(p)
bench._wait_for_chip()  # no holder -> claims immediately
assert open(fake_pid).read().strip() == str(os.getpid()), "bench did not claim pidfile"
assert not os.path.exists(fake_rel)
print("bench chip-claim handoff OK")

snap_src = open("/root/repo/scripts/tpu_snap_run.sh").read()
assert "/tmp/tpu_release" in snap_src and "/tmp/tpu_job.pid" in snap_src and "/tmp/tpu_snap" in snap_src, (
    "tpu_snap_run.sh marker literals moved; refusing to run against REAL paths")
snap = snap_src.replace(
    "/tmp/tpu_release", fake_rel).replace("/tmp/tpu_job.pid", fake_pid).replace(
    "/tmp/tpu_snap", "/tmp/vf_tpu_snap").replace(
    "/root/repo/.round_end_ts", "/tmp/vf_round_end_ts")
open("/tmp/vf_snap.sh", "w").write(snap)
os.remove(fake_pid)
open(fake_rel, "w").write("123")  # fresh marker = live bench waiting
r = subprocess.run(["bash", "/tmp/vf_snap.sh", "true"], capture_output=True, text=True)
assert r.returncode == 4, (r.returncode, r.stderr)
os.utime(fake_rel, (0, 0))  # stale marker -> cleared, job proceeds
r = subprocess.run(["bash", "/tmp/vf_snap.sh", "true"], capture_output=True, text=True)
assert r.returncode == 0 and not os.path.exists(fake_rel), (r.returncode, r.stderr)
print("tpu_snap_run yield-to-live-bench guard OK")
print("DRIVE OK")
