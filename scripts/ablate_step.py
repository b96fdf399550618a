#!/usr/bin/env python
"""Perf attribution on the honest bench workload: time the pieces of the
train step separately so optimization effort goes where the milliseconds are.

Each component runs STEPS reps inside one jitted lax.scan, alternating
between two stacked batches via dynamic_index (prevents XLA loop-invariant
hoisting), with a dependent host read as the sync — same method as bench.py.

  preprocess   voxelize + full U-Net rulebook/plan build (all levels)
  fwd_eval     eval-mode forward (preprocess included)
  fwd_net      eval-mode forward with the plan precomputed (net compute only)
  train        full train step (fwd+bwd+optimizer)

Env: ABL_BATCH (default 10), ABL_STEPS (8), ABL_WHAT (csv of the above).
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("ABL_BATCH", "10"))
STEPS = int(os.environ.get("ABL_STEPS", "8"))
WHAT = os.environ.get("ABL_WHAT", "preprocess,fwd_eval,fwd_net,train").split(",")


def main():
    import jax
    import jax.numpy as jnp

    os.environ.setdefault("BENCH_BATCH", str(BATCH))
    import bench  # reuse the honest-workload scene cache

    from tpu3dwsis.core.buckets import fit_statics
    from tpu3dwsis.data.collate import SceneLabels, collate, to_scene_batch
    from tpu3dwsis.nn.losses import LossConfig, LossFlags
    from tpu3dwsis.nn.network import NetConfig, WSISNet, preprocess
    from tpu3dwsis.train.optim import make_optimizer
    from tpu3dwsis.train.state import init_train_state
    from tpu3dwsis.train.step import make_train_step
    from tpu3dwsis.utils.profiling import enable_compilation_cache

    enable_compilation_cache(os.path.join(bench.CACHE, "jax"))

    scenes = bench.get_scenes()
    statics = fit_statics(scenes, batch_size=BATCH, scale=50.0, num_levels=5, max_instances=64)
    print(f"# statics: voxels={statics.max_voxels} levels={statics.level_sizes} "
          f"points={statics.max_points} sp={statics.max_superpoints} edges={statics.max_edges}",
          file=sys.stderr, flush=True)
    model = WSISNet(NetConfig(classes=20, media=32, blocks=5,
                              unet_dtype="bfloat16", ecc_edge_dtype="bfloat16"))

    rng = np.random.default_rng(0)

    def labels_for(s):
        return SceneLabels(
            point_sem=s.sem, point_ins=s.ins, sp_sem=s.sp_sem_gt, sp_ins=s.sp_ins_gt,
            sp_offset=s.sp_offset_gt,
            sp_occupancy=np.full(s.num_superpoints, 400.0, np.float32),
            sp_size=np.ones(s.num_superpoints, np.float32),
        )

    batches = []
    for i in range(2):
        group = scenes[i * BATCH: (i + 1) * BATCH]
        arrays = collate(group, [labels_for(s) for s in group], statics, rng, training=True)
        batches.append(to_scene_batch(arrays))
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    batch0 = batches[0]

    def pick(stacked_tree, i):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_index_in_dim(x, i % 2, keepdims=False), stacked_tree
        )

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        compile_t = time.perf_counter() - t0
        # discard one full execution: the first timed run of any program on
        # the relay carries a multi-second warm-up artifact
        out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
        float(jnp.sum(leaves[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
        float(jnp.sum(leaves[0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / STEPS * 1000
        print(json.dumps({"component": name, "ms": round(dt, 2),
                          "compile_s": round(compile_t, 1)}), flush=True)
        return dt

    results = {}

    if "preprocess" in WHAT:
        @jax.jit
        def run_pre(stacked):
            def body(acc, i):
                b = pick(stacked, i)
                pre = preprocess(b, statics, use_coords=model.cfg.use_coords)
                s = sum(jnp.sum(l.subm_nbr[0].astype(jnp.float32)) for l in pre.plan.levels)
                return acc + s, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
            return acc
        results["preprocess"] = timed("preprocess", run_pre, stacked)

    variables = None
    if {"fwd_eval", "fwd_net", "train"} & set(WHAT):
        pre0 = preprocess(batch0, statics, use_coords=model.cfg.use_coords)
        variables = model.init(jax.random.PRNGKey(0), batch0, pre0, train=False)

    if "fwd_eval" in WHAT:
        @jax.jit
        def run_fwd(params, bstats, stacked):
            def body(acc, i):
                b = pick(stacked, i)
                pre = preprocess(b, statics, use_coords=model.cfg.use_coords)
                outs = model.apply({"params": params, "batch_stats": bstats}, b, pre, train=False)
                return acc + outs["semantic_scores"][0, 0].astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
            return acc
        results["fwd_eval"] = timed(
            "fwd_eval", run_fwd, variables["params"], variables["batch_stats"], stacked)

    if "fwd_net" in WHAT:
        pre_fn = jax.jit(lambda b: preprocess(b, statics, use_coords=model.cfg.use_coords))
        pres = [pre_fn(b) for b in batches]
        pre_stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs) if xs[0] is not None else None, *pres,
            is_leaf=lambda x: x is None)
        batch_and_pre = (stacked, pre_stacked)

        @jax.jit
        def run_net(params, bstats, batch_and_pre):
            def body(acc, i):
                b, pre = pick(batch_and_pre, i)
                outs = model.apply({"params": params, "batch_stats": bstats}, b, pre, train=False)
                return acc + outs["semantic_scores"][0, 0].astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
            return acc
        results["fwd_net"] = timed(
            "fwd_net", run_net, variables["params"], variables["batch_stats"], batch_and_pre)

    if "train" in WHAT:
        tx = make_optimizer(variables["params"], max_epochs=120, steps_per_epoch=30)
        state = init_train_state(variables["params"], variables["batch_stats"], tx)
        loss_cfg = LossConfig(classes=20, max_instances=64, num_scenes=BATCH)
        raw_step = make_train_step(model, tx, statics,
                                   loss_cfg, LossFlags(True, True, True), jit=False)

        @jax.jit
        def run_train(state, stacked):
            def body(st, i):
                st, out = raw_step(st, pick(stacked, i))
                return st, out["loss"]
            st, losses = jax.lax.scan(body, state, jnp.arange(STEPS))
            return losses
        results["train"] = timed("train", run_train, state, stacked)

    print(json.dumps({"summary": {k: round(v, 1) for k, v in results.items()},
                      "batch": BATCH, "steps": STEPS}))


if __name__ == "__main__":
    main()
