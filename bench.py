"""Benchmark: single-chip training + inference throughput on realistic
ScanNet-statistics scenes (surface-sampled rooms, ~160k pts/scene mean,
250k max — matching the real-scan workload the baseline was measured on).

Prints ONE JSON line: the primary metric is training throughput in
scenes/sec with the heaviest (stage-3) loss configuration at the
reference's batch size 10.  The reference's only published wall-clock
number is ~7.5 min/epoch over 1201 scenes at batch 10 of real ScanNet
scans (~145k pts/scene mean after the 250k crop) on a TITAN RTX in stage 3
(comment at ``/root/reference/train_scannetv2.py:780``) ⇒ **2.67 scenes/sec
= 0.39 Mpts/sec baseline**.  Extra fields report train and eval Mpts/sec so
the comparison is points-normalized, not just scene-normalized.
"""
import json
import os
import sys
import time

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

# batch 6: the largest whole multiple of the ~160k-pt room scenes that fits
# fwd+bwd on a 16 GB v5e (the 24 GB TITAN baseline ran batch 10; scenes/s and
# Mpts/s are batch-normalized so the comparison stands)
BATCH = int(os.environ.get("BENCH_BATCH", "6"))
NUM_SCENES = max(2 * BATCH, 8)
BASELINE_TRAIN_SCENES_PER_SEC = 1201 * 1 / (7.5 * 60) * 1.0  # 2.67


def get_scenes():
    from tpu3dwsis.data.scene import load_scene, save_scene
    from tpu3dwsis.data.synthetic import make_room_scene

    os.makedirs(CACHE, exist_ok=True)
    scenes = []
    for s in range(NUM_SCENES):
        path = os.path.join(CACHE, f"bench_room_{s}.npz")
        if os.path.exists(path):
            scenes.append(load_scene(path))
        else:
            sc = make_room_scene(seed=s)
            save_scene(sc, path)
            scenes.append(sc)
    return scenes


def main():
    import jax

    from tpu3dwsis.utils.profiling import enable_compilation_cache

    enable_compilation_cache(os.path.join(CACHE, "jax"))
    verbose = os.environ.get("BENCH_VERBOSE", "1") == "1"

    def note(msg):
        if verbose:
            print(f"# bench: {msg}", file=sys.stderr, flush=True)

    from tpu3dwsis.data.collate import SceneLabels, collate, to_scene_batch
    from tpu3dwsis.nn.losses import LossConfig, LossFlags
    from tpu3dwsis.nn.network import NetConfig, WSISNet, preprocess
    from tpu3dwsis.train.optim import make_optimizer
    from tpu3dwsis.train.state import init_train_state
    from tpu3dwsis.train.step import make_forward_fn, make_train_step

    scenes = get_scenes()
    # capacities measured from the scenes (incl. the real per-level
    # downsample ladder — a naive /2 ladder silently drops voxels on dense
    # scans); 1.3x margin, training aug margins on the spatial extents
    from tpu3dwsis.core.buckets import fit_statics

    statics = fit_statics(scenes, batch_size=BATCH, scale=50.0, num_levels=5, max_instances=64)
    unet_dtype = os.environ.get("BENCH_UNET_DTYPE", "bfloat16")
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    model = WSISNet(
        NetConfig(
            classes=20, media=32, blocks=5,
            unet_dtype=unet_dtype, ecc_edge_dtype=unet_dtype, remat=remat,
        )
    )

    def labels_for(sc):
        return SceneLabels(
            point_sem=sc.sem,
            point_ins=sc.ins,
            sp_sem=sc.sp_sem_gt,
            sp_ins=sc.sp_ins_gt,
            sp_offset=sc.sp_offset_gt,
            sp_occupancy=np.full(sc.num_superpoints, 400.0, np.float32),
            sp_size=np.ones(sc.num_superpoints, np.float32),
        )

    rng = np.random.default_rng(0)
    batches = []
    for i in range(2):
        group = scenes[i * BATCH : (i + 1) * BATCH]
        arrays = collate(group, [labels_for(s) for s in group], statics, rng, training=True)
        batches.append(to_scene_batch(arrays))

    note("scenes collated; initializing model (first device compile)")
    pre = preprocess(batches[0], statics)
    variables = model.init(jax.random.PRNGKey(0), batches[0], pre, train=False)
    note("init done")
    tx = make_optimizer(variables["params"], max_epochs=120, steps_per_epoch=30)
    state = init_train_state(variables["params"], variables["batch_stats"], tx)

    loss_cfg = LossConfig(classes=20, max_instances=64, num_scenes=BATCH)
    flags = LossFlags(True, True, True)  # stage-3: every loss term on
    raw_step = make_train_step(model, tx, statics, loss_cfg, flags, jit=False)

    # ---- train throughput: N steps inside ONE lax.scan, so the timing is
    # device-bound and immune to the ~90 ms host<->device relay latency of
    # this environment; sync = a single dependent host read. ----
    import jax.numpy as jnp

    n_steps = 12
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)

    @jax.jit
    def run_steps(state, stacked):
        def body(st, i):
            batch = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, i % 2, keepdims=False), stacked
            )
            st, out = raw_step(st, batch)
            return st, out["loss"]
        return jax.lax.scan(body, state, jnp.arange(n_steps))

    note("compiling scanned train steps")
    new_state, losses_dev = run_steps(state, stacked)
    final_loss = float(losses_dev[-1])
    note("train compiled; timing")
    t0 = time.perf_counter()
    new_state, losses_dev = run_steps(state, stacked)
    final_loss = float(losses_dev[-1])
    train_dt = time.perf_counter() - t0
    state = new_state
    train_scenes_per_sec = BATCH * n_steps / train_dt
    batch_points = [int(np.asarray(b.point_valid).sum()) for b in batches]
    train_points = sum((batch_points * ((n_steps + 1) // 2))[:n_steps])
    train_mpts_per_sec = train_points / train_dt / 1e6

    # ---- inference throughput (eval forward) ----
    note("compiling scanned inference")
    n_inf = 12
    from tpu3dwsis.nn.network import preprocess as _pre

    @jax.jit
    def run_forwards(params, batch_stats, stacked):
        def body(acc, i):
            batch = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, i % 2, keepdims=False), stacked
            )
            pre = _pre(batch, statics, use_coords=model.cfg.use_coords)
            outs = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch, pre, train=False
            )
            return acc + outs["semantic_scores"][0, 0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n_inf))
        return acc

    acc = run_forwards(state.params, state.batch_stats, stacked)
    float(acc)
    note("inference compiled; timing")
    t0 = time.perf_counter()
    acc = run_forwards(state.params, state.batch_stats, stacked)
    float(acc)
    inf_dt = time.perf_counter() - t0
    total_points = sum(
        int(np.asarray(b.point_valid).sum()) for b in (batches * ((n_inf + 1) // 2))[:n_inf]
    )
    inf_scenes_per_sec = BATCH * n_inf / inf_dt
    mpts_per_sec = total_points / inf_dt / 1e6

    print(
        json.dumps(
            {
                "metric": "train_scenes_per_sec_stage3",
                "value": round(train_scenes_per_sec, 3),
                "unit": "scenes/s",
                "vs_baseline": round(train_scenes_per_sec / BASELINE_TRAIN_SCENES_PER_SEC, 2),
                "extra": {
                    "train_mpts_per_sec": round(train_mpts_per_sec, 3),
                    "inference_scenes_per_sec": round(inf_scenes_per_sec, 3),
                    "inference_mpts_per_sec": round(mpts_per_sec, 3),
                    "points_per_scene": int(np.mean([s.num_points for s in scenes])),
                    "baseline_mpts_per_sec": 0.39,
                    "batch": BATCH,
                    "device": str(jax.devices()[0]),
                    "train_step_ms": round(1000 * train_dt / n_steps, 1),
                    "final_loss": round(final_loss, 4),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
