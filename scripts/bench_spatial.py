#!/usr/bin/env python
"""10M-point batched whole-scene inference over spatially-sharded devices
(BASELINE config 5; the reference cannot run this at all — it crops every
scene to 250k points, ``scannetv2_dataset.py:251-273``).

Builds a batch of surface-sampled room scenes totalling SPATIAL_POINTS
(default 10M) points, partitions the voxel x-axis into one slab per device
(``dist/spatial.py``), and times the sharded eval forward.  Prints one JSON
line with Mpts/s.

On the single-chip relay this degenerates to 1 shard (still a valid
10M-point whole-batch forward — eval has no optimizer/backward live set);
on a pod slice it scales by slabs.  The numeric parity of the sharded
forward vs single-device is covered by ``tests/test_spatial_shard.py``.

Env: SPATIAL_POINTS (1e7), SPATIAL_SHARDS (all devices), SPATIAL_REPS (4).
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# JAX_PLATFORMS env is pinned to axon by a sitecustomize before any code
# runs; a platform override must happen in Python before first backend use
# (SPATIAL_PLATFORM=cpu for the virtual-device run — also guards against
# accidentally attaching a second job to the TPU).
if os.environ.get("SPATIAL_PLATFORM"):
    if os.environ["SPATIAL_PLATFORM"] == "cpu":
        # One physical core executes the 8 virtual devices' programs nearly
        # serially, so the skew between the first and last shard reaching a
        # collective far exceeds XLA:CPU's default rendezvous timeouts
        # (20 s warn / 40 s terminate — the r4 2.14M-pt run died with
        # "Termination timeout ... only 1 of them arrived", .spatial_cpu8_r4.log).
        # Flags must be in XLA_FLAGS before the first backend use.
        flags = os.environ.get("XLA_FLAGS", "")
        if "--xla_force_host_platform_device_count" not in flags:
            flags += (" --xla_force_host_platform_device_count="
                      + os.environ.get("SPATIAL_CPU_DEVICES", "8"))
        flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
                  " --xla_cpu_collective_call_terminate_timeout_seconds=7200")
        os.environ["XLA_FLAGS"] = flags
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["SPATIAL_PLATFORM"])

TARGET_POINTS = float(os.environ.get("SPATIAL_POINTS", "1e7"))
REPS = int(os.environ.get("SPATIAL_REPS", "4"))
CACHE = os.path.join(REPO, ".bench_cache")


def main():
    import jax
    import jax.numpy as jnp

    from tpu3dwsis.core.buckets import fit_statics
    from tpu3dwsis.data.collate import SceneLabels, collate
    from tpu3dwsis.data.scene import load_scene, save_scene
    from tpu3dwsis.data.synthetic import make_room_scene
    from tpu3dwsis.dist.spatial import build_spatial_batch, make_spatial_forward
    from tpu3dwsis.nn.network import NetConfig, WSISNet, preprocess
    from tpu3dwsis.utils.profiling import enable_compilation_cache

    # persistent cache only for the TPU path: CPU AOT entries are machine-
    # feature-specific and SIGILL when the container moves hosts
    if not os.environ.get("SPATIAL_PLATFORM"):
        enable_compilation_cache(os.path.join(CACHE, "jax"))
    os.makedirs(CACHE, exist_ok=True)

    scenes, total = [], 0
    i = 0
    while total < TARGET_POINTS:
        path = os.path.join(CACHE, f"bench_room_{i}.npz")  # share bench.py's cache
        if os.path.exists(path):
            sc = load_scene(path)
        else:
            sc = make_room_scene(seed=i)
            save_scene(sc, path)
        scenes.append(sc)
        total += sc.num_points
        i += 1
    print(f"# {len(scenes)} scenes, {total/1e6:.2f}M points", file=sys.stderr, flush=True)

    statics = fit_statics(
        scenes, batch_size=len(scenes), scale=50.0, num_levels=5,
        max_instances=64, aug_margin=(1.0, 1.0, 1.0),
    )
    labels = [
        SceneLabels(s.sem, s.ins, s.sp_sem_gt, s.sp_ins_gt, s.sp_offset_gt)
        for s in scenes
    ]
    arrays = collate(scenes, labels, statics, np.random.default_rng(0), training=False)

    n_shards = int(os.environ.get("SPATIAL_SHARDS", str(len(jax.devices()))))
    sb = build_spatial_batch(
        arrays, statics.spatial_shape, statics.max_batch,
        n_shards=n_shards, num_levels=statics.num_levels,
    )
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:n_shards]), ("space",))

    model = WSISNet(NetConfig(classes=20, media=32, blocks=5,
                              unet_dtype="bfloat16", ecc_edge_dtype="bfloat16"))
    # init on a tiny single-scene batch: params depend only on shapes/PRNG
    from tpu3dwsis.data.collate import to_scene_batch

    small_statics = fit_statics(scenes[:1], batch_size=1, scale=50.0, num_levels=5,
                                max_instances=64, aug_margin=(1.0, 1.0, 1.0))
    sarr = collate(scenes[:1], labels[:1], small_statics, np.random.default_rng(0),
                   training=False)
    sbatch = to_scene_batch(sarr)
    variables = model.init(jax.random.PRNGKey(0), sbatch,
                           preprocess(sbatch, small_statics), train=False)

    fwd = make_spatial_forward(model, mesh, sb.spatial_shape, sb.max_batch, axis="space")
    levels_dev = jax.tree_util.tree_map(jnp.asarray, sb.levels)
    batches_dev = jax.tree_util.tree_map(jnp.asarray, sb.batches)

    t0 = time.perf_counter()
    outs = fwd(variables["params"], variables["batch_stats"], levels_dev, batches_dev)
    float(jnp.sum(outs["semantic_scores"][0, 0].astype(jnp.float32)))
    compile_t = time.perf_counter() - t0

    # discard one execution (relay warm-up artifact — TPU only; the CPU
    # backend has no relay and a 2M-pt single-core forward costs minutes)
    if os.environ.get("SPATIAL_PLATFORM") != "cpu":
        outs = fwd(variables["params"], variables["batch_stats"], levels_dev, batches_dev)
        float(jnp.sum(outs["semantic_scores"][0, 0].astype(jnp.float32)))
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(REPS):
        outs = fwd(variables["params"], variables["batch_stats"], levels_dev, batches_dev)
        acc += float(jnp.sum(outs["semantic_scores"][0, 0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / REPS
    valid_points = int(np.asarray(arrays["point_valid"]).sum())

    # slab-occupancy spread + halo sizes per level (capacity honesty: wildly
    # imbalanced slabs would blow the padded per-shard row capacity)
    slab_stats = []
    for l, lv in enumerate(sb.levels):
        owned = np.asarray(lv.owned).sum(axis=1)
        halo_cap = int(lv.recv_left.shape[1])
        slab_stats.append({
            "level": l,
            "owned_min": int(owned.min()), "owned_max": int(owned.max()),
            "owned_mean": int(owned.mean()),
            "row_capacity": int(lv.valid.shape[1]),
            "halo_capacity": halo_cap,
        })

    result = {
        "metric": "spatial_inference_mpts_per_sec",
        "value": round(valid_points / dt / 1e6, 3),
        "unit": "Mpts/s",
        "extra": {
            "points": valid_points,
            "scenes": len(scenes),
            "shards": n_shards,
            "forward_s": round(dt, 3),
            "compile_s": round(compile_t, 1),
            "device": str(jax.devices()[0]),
            "slabs": slab_stats,
        },
    }
    print(json.dumps(result))
    out_path = os.environ.get("SPATIAL_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
