#!/usr/bin/env python
"""Perf attribution on the honest bench workload: time the pieces of the
train step separately so optimization effort goes where the milliseconds are.

Two protocols (both discard compile + one warm-up execution — the first
timed run of any program on the relay carries a multi-second artifact):

* BIG components (train / grad / fwd_train / fwd_eval): sequential jitted
  calls with a dependent host read each, exactly like bench.py — so the
  persistent compile cache shares entries with bench runs, and no single
  device execution exceeds the ~60 s relay crash threshold.
* SMALL components (preprocess / unet / ecc / convs / points / losses / opt):
  a jitted lax.scan of ABL_STEPS reps alternating two inputs via
  dynamic_index (prevents loop-invariant hoisting), one host read at the end.

Env: ABL_BATCH (default 6 = bench batch), ABL_STEPS (8), ABL_WHAT (csv).
Components: train grad opt fwd_train fwd_eval preprocess unet unet_grad
            ecc_grad convs points losses
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("ABL_BATCH", "6"))
STEPS = int(os.environ.get("ABL_STEPS", "8"))
DEFAULT = "train,grad,opt,fwd_train,fwd_eval,preprocess,unet,unet_grad,ecc_grad,convs,points,losses"
WHAT = os.environ.get("ABL_WHAT", DEFAULT).split(",")

results = {}


def report(name, ms, compile_s):
    results[name] = ms
    print(json.dumps({"component": name, "ms": round(ms, 2),
                      "compile_s": round(compile_s, 1)}), flush=True)


def guard(name, thunk):
    """One failing component must not kill the rest of the attribution run."""
    try:
        thunk()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"component": name, "error": repr(e)[:500]}), flush=True)


def _read(out):
    """Dependent host read (block_until_ready returns early on the relay)."""
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timed_seq(name, fn, args_a, args_b, reps=4):
    """Sequential protocol: compile, warm-up, then reps alternating calls."""
    try:
        t0 = time.perf_counter()
        _read(fn(*args_a))
        compile_t = time.perf_counter() - t0
        _read(fn(*args_b))
        t0 = time.perf_counter()
        for i in range(reps):
            _read(fn(*(args_a if i % 2 == 0 else args_b)))
        report(name, (time.perf_counter() - t0) / reps * 1000, compile_t)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"component": name, "error": repr(e)[:500]}), flush=True)


def timed_scan(name, fn, *args):
    """Scan protocol: fn is already jitted and internally runs STEPS reps."""
    try:
        t0 = time.perf_counter()
        _read(fn(*args))
        compile_t = time.perf_counter() - t0
        _read(fn(*args))
        t0 = time.perf_counter()
        _read(fn(*args))
        report(name, (time.perf_counter() - t0) / STEPS * 1000, compile_t)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"component": name, "error": repr(e)[:500]}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("ABL_CPU"):  # correctness smoke off-TPU (sitecustomize
        jax.config.update("jax_platforms", "cpu")  # pins axon otherwise)

    os.environ.setdefault("BENCH_BATCH", str(BATCH))
    import bench  # reuse the honest-workload scene cache

    from tpu3dwsis.core.buckets import fit_statics
    from tpu3dwsis.data.collate import SceneLabels, collate, to_scene_batch
    from tpu3dwsis.nn.losses import LossConfig, LossFlags, multi_task_loss
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
    batch0, batch1 = batches

    def pick(stacked_tree, i):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_index_in_dim(x, i % 2, keepdims=False), stacked_tree
        )

    # ---- shared state: init exactly like bench.py (compile-cache shared).
    # Skipped when no requested component needs model params (e.g. a
    # convs-only run) — the init forward is a 10-20 min remote compile. ----
    needs_model = {"fwd_eval", "fwd_net", "fwd_train", "grad", "opt", "train",
                   "losses"} & set(WHAT)
    state = None
    if needs_model:
        pre0 = preprocess(batch0, statics)
        variables = model.init(jax.random.PRNGKey(0), batch0, pre0, train=False)
        print("# init done", file=sys.stderr, flush=True)
        tx = make_optimizer(variables["params"], max_epochs=120, steps_per_epoch=30)
        state = init_train_state(variables["params"], variables["batch_stats"], tx)
    loss_cfg = LossConfig(classes=20, max_instances=64, num_scenes=BATCH)
    flags = LossFlags(True, True, True)

    # =================== BIG components (sequential) ===================
    if "fwd_eval" in WHAT:
        # identical program to bench.py's run_forward (cache-shared)
        @jax.jit
        def run_forward(params, batch_stats, batch):
            pre = preprocess(batch, statics, use_coords=model.cfg.use_coords)
            outs = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch, pre, train=False
            )
            return outs["semantic_scores"][0, 0]
        timed_seq("fwd_eval", run_forward,
                  (state.params, state.batch_stats, batch0),
                  (state.params, state.batch_stats, batch1))

    if "fwd_train" in WHAT:
        @jax.jit
        def run_fwd_train(params, batch_stats, batch):
            pre = preprocess(batch, statics, use_coords=model.cfg.use_coords)
            outs, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats}, batch, pre,
                train=True, mutable=["batch_stats"],
            )
            loss, _ = multi_task_loss(outs, batch, loss_cfg, flags)
            return loss
        timed_seq("fwd_train", run_fwd_train,
                  (state.params, state.batch_stats, batch0),
                  (state.params, state.batch_stats, batch1))

    grads0 = None
    if "grad" in WHAT or "opt" in WHAT:
        @jax.jit
        def run_grad(params, batch_stats, batch):
            pre = preprocess(batch, statics, use_coords=model.cfg.use_coords)

            def loss_fn(p):
                outs, mutated = model.apply(
                    {"params": p, "batch_stats": batch_stats}, batch, pre,
                    train=True, mutable=["batch_stats"],
                )
                loss, _ = multi_task_loss(outs, batch, loss_cfg, flags)
                return loss
            # returning the FULL grad tree OOMs: the outputs alone are a
            # param-sized tree resident ON TOP of params + bwd workspace
            # (the real train step donates state and consumes grads in the
            # fused update, so it fits — r5 .ablate_r5_grad.log).  A scalar
            # checksum keeps every backward op in the program but lets XLA
            # free grad buffers as it folds them into the reduction.
            loss, grads = jax.value_and_grad(loss_fn)(params)
            leaves = jax.tree_util.tree_leaves(grads)
            return loss + sum(jnp.sum(g.astype(jnp.float32)) for g in leaves)
        if "grad" in WHAT:
            timed_seq("grad", run_grad,
                      (state.params, state.batch_stats, batch0),
                      (state.params, state.batch_stats, batch1))
        # the opt probe times ONLY the optimizer update: synthetic grads of
        # the right tree shape serve exactly as well as real ones and avoid
        # holding a second batch + backward program live
        grads0 = jax.tree_util.tree_map(
            lambda x: (x * 1e-3).astype(x.dtype), state.params)

    if "opt" in WHAT and grads0 is not None:
        import optax

        @jax.jit
        def run_opt(grads, opt_state, params):
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt
        g_b = jax.tree_util.tree_map(lambda x: x * 1.001, grads0)
        timed_seq("opt", run_opt,
                  (grads0, state.opt_state, state.params),
                  (g_b, state.opt_state, state.params), reps=8)

    if "train" in WHAT:
        # identical program to bench.py's step (donate, cache-shared).
        # Donation consumes the input buffers, so hand it a COPY of the state
        # (later components still read state.params).
        step = make_train_step(model, tx, statics, loss_cfg, flags, donate=True)
        state_c = jax.tree_util.tree_map(jnp.array, state)
        t0 = time.perf_counter()
        state2, out = step(state_c, batch0)
        float(out["loss"])
        compile_t = time.perf_counter() - t0
        state2, out = step(state2, batch1)
        float(out["loss"])
        t0 = time.perf_counter()
        reps = 4
        for i in range(reps):
            state2, out = step(state2, batches[i % 2])
            float(out["loss"])
        report("train", (time.perf_counter() - t0) / reps * 1000, compile_t)

    if "h2d" in WHAT:
        # Host->device cost of one collated batch over the relay tunnel.
        # The curriculum pays this per step on FRESH bytes (every collate is
        # re-augmented), while bench/ablate alternate two identical buffers —
        # if the relay content-caches uploads, the cost hides there and shows
        # up only in the curriculum's step_t.  h2d_same vs h2d_fresh splits
        # that: equal numbers mean no caching (transfer is honest), a large
        # gap means fresh-byte uploads are the curriculum's hidden tax.
        host_tree = jax.tree_util.tree_map(np.asarray, batch0)
        nbytes = sum(v.nbytes for v in jax.tree_util.tree_leaves(host_tree))

        @jax.jit
        def checksum(b):
            leaves = jax.tree_util.tree_leaves(b)
            return sum(l.ravel()[0].astype(jnp.float32) for l in leaves)

        def h2d_probe(name, trees):
            try:
                float(checksum(jax.device_put(trees[0])))  # compile + warm
                t0 = time.perf_counter()
                for t in trees[1:]:
                    float(checksum(jax.device_put(t)))
                report(name, (time.perf_counter() - t0) / (len(trees) - 1) * 1000,
                       0.0)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"component": name, "error": repr(e)[:500]}),
                      flush=True)

        print(f"# h2d batch bytes: {nbytes/1e6:.1f} MB", file=sys.stderr, flush=True)
        h2d_probe("h2d_same", [host_tree] * 5)
        fresh = []
        for i in range(5):
            t = jax.tree_util.tree_map(np.copy, host_tree)
            t = t._replace(point_feats=t.point_feats + np.float32(i + 1) * 1e-6)
            fresh.append(t)
        h2d_probe("h2d_fresh", fresh)

    # =================== SMALL components (scan) ===================
    if "fwd_net" in WHAT:
        # apply-only with a precomputed plan: fwd_eval - fwd_net = the true
        # in-context preprocess cost (the standalone preprocess micro DCEs
        # the down links / pooling / sp_center it never reads)
        pre_fn0 = jax.jit(lambda b: preprocess(b, statics, use_coords=model.cfg.use_coords))
        pres0 = [jax.tree_util.tree_map(lambda x: x.block_until_ready(), pre_fn0(b))
                 for b in batches]

        @jax.jit
        def run_net(params, bstats, batch, pre):
            outs = model.apply({"params": params, "batch_stats": bstats}, batch, pre,
                               train=False)
            return outs["semantic_scores"][0, 0]
        timed_seq("fwd_net", run_net,
                  (state.params, state.batch_stats, batch0, pres0[0]),
                  (state.params, state.batch_stats, batch1, pres0[1]))

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
        timed_scan("preprocess", run_pre, stacked)

    # precomputed plans for net-only timings
    pre_fn = jax.jit(lambda b: preprocess(b, statics, use_coords=model.cfg.use_coords))
    pres = [jax.tree_util.tree_map(lambda x: x.block_until_ready(), pre_fn(b))
            for b in batches]
    pre_stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs) if xs[0] is not None else None, *pres,
        is_leaf=lambda x: x is None)

    uvars = None
    if "unet" in WHAT or "unet_grad" in WHAT:
        from tpu3dwsis.nn.unet import SparseUNet

        unet = SparseUNet(32, 5, 2)
        try:
            uvars = unet.init(jax.random.PRNGKey(0),
                              pres[0].voxel_feats.astype(jnp.bfloat16), pres[0].plan, False)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"component": "unet_init", "error": repr(e)[:500]}), flush=True)

        if "unet" in WHAT and uvars is not None:
            @jax.jit
            def run_unet(params, bstats, pre_stacked):
                def body(acc, i):
                    pre = pick(pre_stacked, i)
                    out = unet.apply({"params": params, "batch_stats": bstats},
                                     pre.voxel_feats.astype(jnp.bfloat16), pre.plan, False)
                    return acc + out[0, 0].astype(jnp.float32), None
                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
                return acc
            timed_scan("unet", run_unet, uvars["params"], uvars["batch_stats"], pre_stacked)

        if "unet_grad" in WHAT and uvars is not None:
            half = max(STEPS // 2, 1)

            @jax.jit
            def run_unet_grad(params, bstats, pre_stacked):
                def one(p, pre):
                    out, _ = unet.apply({"params": p, "batch_stats": bstats},
                                        pre.voxel_feats.astype(jnp.bfloat16), pre.plan,
                                        True, mutable=["batch_stats"])
                    return jnp.sum(out.astype(jnp.float32))

                def body(acc, i):
                    pre = pick(pre_stacked, i)
                    _, g = jax.value_and_grad(one)(params, pre)
                    lv = jax.tree_util.tree_leaves(g)[0]
                    return acc + jnp.sum(lv.astype(jnp.float32)), None
                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(half))
                return acc
            try:
                t0 = time.perf_counter()
                _read(run_unet_grad(uvars["params"], uvars["batch_stats"], pre_stacked))
                compile_t = time.perf_counter() - t0
                _read(run_unet_grad(uvars["params"], uvars["batch_stats"], pre_stacked))
                t0 = time.perf_counter()
                _read(run_unet_grad(uvars["params"], uvars["batch_stats"], pre_stacked))
                report("unet_grad", (time.perf_counter() - t0) / half * 1000, compile_t)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"component": "unet_grad", "error": repr(e)[:500]}), flush=True)

    if "ecc_grad" in WHAT:
        from tpu3dwsis.nn.ecc import EccGraphNetwork

        ecc = EccGraphNetwork(32, 7, 64, edge_dtype="bfloat16")
        s = statics.max_superpoints
        emb = [jnp.asarray(np.random.default_rng(i).normal(size=(s, 32)), jnp.float32)
               for i in range(2)]
        emb_stacked = jnp.stack(emb)
        b0 = batch0
        try:
            evars = ecc.init(jax.random.PRNGKey(0), emb[0], b0.edge_u, b0.edge_v,
                             b0.edge_feats, b0.edge_valid, b0.sp_valid, False)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"component": "ecc_init", "error": repr(e)[:500]}), flush=True)
            evars = None

        @jax.jit
        def run_ecc_grad(params, bstats, emb_stacked, batch):
            def one(p, e):
                out, _ = ecc.apply({"params": p, "batch_stats": bstats},
                                   e, batch.edge_u, batch.edge_v, batch.edge_feats,
                                   batch.edge_valid, batch.sp_valid, True,
                                   mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32))

            def body(acc, i):
                e = jax.lax.dynamic_index_in_dim(emb_stacked, i % 2, keepdims=False)
                _, g = jax.value_and_grad(one)(params, e)
                lv = jax.tree_util.tree_leaves(g)[0]
                return acc + jnp.sum(lv.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
            return acc
        if evars is not None:
            timed_scan("ecc_grad", run_ecc_grad, evars["params"], evars["batch_stats"],
                       emb_stacked, batch0)

    if "points" in WHAT:
        # vox->point gather + superpoint segment-mean pooling (fwd only)
        m0 = statics.max_voxels
        vfeat = [jnp.asarray(np.random.default_rng(i).normal(size=(m0 + 1, 32)),
                             jnp.float32) for i in range(2)]
        vf_stacked = jnp.stack(vfeat)

        from tpu3dwsis.ops.segment import segment_mean

        @jax.jit
        def run_points(vf_stacked, batch, pre):
            s = batch.num_superpoints

            def body(acc, i):
                vf = jax.lax.dynamic_index_in_dim(vf_stacked, i % 2, keepdims=False)
                pf = vf[pre.p2v]
                emb = segment_mean(pf, batch.point_sp, s + 1)[:s]
                return acc + jnp.sum(emb[0]) + pf[0, 0], None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
            return acc
        timed_scan("points", run_points, vf_stacked, batch0, pres[0])

    if "losses" in WHAT:
        fwd = jax.jit(lambda p, bs, b, pre: model.apply(
            {"params": p, "batch_stats": bs}, b, pre, train=False))
        try:
            outs0 = fwd(state.params, state.batch_stats, batch0, pres[0])
            outs0 = jax.tree_util.tree_map(lambda x: x.block_until_ready(), outs0)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"component": "losses_setup", "error": repr(e)[:500]}), flush=True)
            outs0 = None
    if "losses" in WHAT and outs0 is not None:
        outs1 = jax.tree_util.tree_map(lambda x: x * 1.0001, outs0)
        outs_stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), outs0, outs1)

        @jax.jit
        def run_losses(outs_stacked, batch):
            def one(o):
                loss, _ = multi_task_loss(o, batch, loss_cfg, flags)
                return loss

            def body(acc, i):
                o = pick(outs_stacked, i)
                _, g = jax.value_and_grad(one)(o)
                return acc + jnp.sum(g["semantic_scores"][0].astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
            return acc
        timed_scan("losses", run_losses, outs_stacked, batch0)

    if "bn" in WHAT:
        # masked-BN train chain at L0 scale: the pre-activation epilogues
        from tpu3dwsis.nn.norm import MaskedBatchNorm

        m0 = statics.max_voxels
        xb = jax.random.normal(jax.random.PRNGKey(0), (2, m0, 32), jnp.bfloat16)
        maskb = jnp.ones((m0,), bool)
        bn = MaskedBatchNorm(32)
        bvars = bn.init(jax.random.PRNGKey(0), xb[0], maskb, True)

        @jax.jit
        def run_bn(params, bstats, xb, maskb):
            def body(acc, i):
                x = jax.lax.dynamic_index_in_dim(xb, i % 2, keepdims=False)
                y, _ = bn.apply({"params": params, "batch_stats": bstats},
                                x, maskb, True, mutable=["batch_stats"])
                y = jax.nn.relu(y)
                return acc + y[0, 0].astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
            return acc
        timed_scan("bn_relu_L0", run_bn, bvars["params"], bvars["batch_stats"],
                   xb, maskb)

    if "planhoist" in WHAT:
        # does XLA CSE the per-conv _plan_windows recomputation?  time 1 vs 2
        # convs on the SAME table in one jit: CSE ⇒ delta == kernel-only cost
        from tpu3dwsis.ops import sparse_conv

        lp0 = None
        pre_probe = jax.jit(lambda b: preprocess(b, statics, use_coords=model.cfg.use_coords))
        pr = pre_probe(batch0)
        lp0 = pr.plan.levels[0]
        m = lp0.subm_nbr.shape[1]
        x2 = jax.random.normal(jax.random.PRNGKey(1), (2, m, 32), jnp.bfloat16)
        w1 = jax.random.normal(jax.random.PRNGKey(2), (27, 32, 32), jnp.bfloat16) * 0.05
        w2 = jax.random.normal(jax.random.PRNGKey(3), (27, 32, 32), jnp.bfloat16) * 0.05

        @jax.jit
        def run_two(x2, nbr, w1, w2):
            def body(acc, i):
                x = jax.lax.dynamic_index_in_dim(x2, i % 2, keepdims=False)
                y = sparse_conv.subm_conv(x, nbr, w1)
                z = sparse_conv.subm_conv(y, nbr, w2)
                return acc + z[0, 0].astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
            return acc
        timed_scan(f"subm_two_chained_L0_m{m}", run_two, x2, lp0.subm_nbr, w1, w2)

    # =================== plan-construction probes ===================
    # fwd_eval - fwd_net measured ~1.3 s of in-context preprocess (the
    # standalone probe DCEs everything but subm_nbr[0]); these attribute it.
    # Every probe alternates two REAL inputs via dynamic_index so nothing is
    # loop-invariant-hoisted out of the scan.
    plan_probes = {"plan_full", "vox", "subm_L0", "subm_L1", "lookup_L0",
                   "invert_L0", "down_L0", "pool", "scatter"}
    if plan_probes & set(WHAT):
        from tpu3dwsis.ops import hashgrid, rulebook
        from tpu3dwsis.ops import voxelize as vox_ops
        from tpu3dwsis.ops.merge_lookup import merge_lookup

        lvls0 = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            pres[0].plan.levels[0].level, pres[1].plan.levels[0].level)
        lvls1 = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            pres[0].plan.levels[1].level, pres[1].plan.levels[1].level)
        m0 = pres[0].plan.levels[0].level.keys.shape[0]

        def force(*arrs):
            return sum(jnp.sum(a.astype(jnp.float32)) for a in arrs)

        def plan_scan(name, body_of, stacked_in):
            @jax.jit
            def run(stacked_in):
                def body(acc, i):
                    return acc + body_of(pick(stacked_in, i)), None
                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
                return acc
            timed_scan(name, run, stacked_in)

        if "plan_full" in WHAT:
            def full_body(b):
                v = vox_ops.voxelize_coords(
                    b.point_coords, statics.spatial_shape, statics.max_batch,
                    statics.max_voxels, valid=b.point_valid)
                plan = rulebook.build_unet_plan(
                    rulebook.VoxelLevel(v.keys, v.coords, v.valid),
                    statics.spatial_shape, statics.max_batch,
                    statics.num_levels, statics.level_sizes)
                s = force(v.p2v)
                for lp in plan.levels:
                    s += force(lp.subm_nbr)
                    if lp.down_nbr is not None:
                        s += force(lp.down_nbr, lp.parent, lp.child_offset)
                return s
            plan_scan("plan_full", full_body, stacked)

        if "vox" in WHAT:
            def vox_body(b):
                v = vox_ops.voxelize_coords(
                    b.point_coords, statics.spatial_shape, statics.max_batch,
                    statics.max_voxels, valid=b.point_valid)
                return force(v.keys, v.p2v)
            plan_scan("vox", vox_body, stacked)

        if "subm_L0" in WHAT:
            plan_scan("subm_L0",
                      lambda lv: force(rulebook.build_subm_table(
                          lv, statics.spatial_shape, statics.max_batch)),
                      lvls0)
        if "subm_L1" in WHAT:
            shape1 = tuple((s + 1) // 2 for s in statics.spatial_shape)
            plan_scan("subm_L1",
                      lambda lv: force(rulebook.build_subm_table(
                          lv, shape1, statics.max_batch)),
                      lvls1)

        if "lookup_L0" in WHAT:
            strides = np.asarray(
                hashgrid.coord_strides(statics.spatial_shape, statics.max_batch)[1:],
                np.int64)
            delta = int((strides * np.array([-1, 0, 0], np.int64)).sum())

            def lk_body(lv):
                pos, found = merge_lookup(lv.keys, lv.keys + jnp.int32(delta))
                return force(pos, found)
            plan_scan("lookup_L0", lk_body, lvls0)

        if "invert_L0" in WHAT:
            negs = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                pres[0].plan.levels[0].subm_nbr[:13],
                pres[1].plan.levels[0].subm_nbr[:13])

            def inv_body(neg):
                rows = jnp.arange(m0, dtype=jnp.int32)

                def invert(nbr_k):
                    inv = jnp.full((m0 + 1,), m0, jnp.int32).at[nbr_k].set(
                        rows, mode="drop")
                    return inv[:m0]
                return force(jax.vmap(invert)(neg))
            plan_scan("invert_L0", inv_body, negs)

        if "down_L0" in WHAT:
            def down_body(lv):
                coarse, down_nbr, parent, child_offset = rulebook.build_downsample(
                    lv, statics.spatial_shape, statics.max_batch,
                    statics.level_sizes[1])
                return force(coarse.keys, down_nbr, parent, child_offset)
            plan_scan("down_L0", down_body, lvls0)

        if "pool" in WHAT:
            both = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                (batch0, pres[0].p2v), (batch1, pres[1].p2v))

            def pool_body(bp):
                b, p2v = bp
                feats = jnp.concatenate(
                    [b.point_rgb, b.point_xyz.astype(b.point_rgb.dtype)], axis=1)
                vf = vox_ops.voxel_mean_pool(feats, p2v, statics.max_voxels)
                from tpu3dwsis.ops.segment import segment_mean
                s = b.num_superpoints
                spc = segment_mean(b.point_xyz, b.point_sp, s + 1)[:s]
                return force(vf, spc)
            plan_scan("pool", pool_body, both)

        if "scatter" in WHAT:
            # raw 1-D int32 scatter cost at L0 scale: unique-permutation vs
            # duplicate-heavy indices vs the same-size gather
            perms = jnp.stack([jax.random.permutation(jax.random.PRNGKey(k), m0)
                               for k in range(2)]).astype(jnp.int32)
            dups = perms // 2  # every target hit twice
            vals = jnp.arange(m0, dtype=jnp.int32)

            def sc_body(idx):
                out = jnp.full((m0 + 1,), 0, jnp.int32).at[idx].set(vals, mode="drop")
                return out[0].astype(jnp.float32) + out[m0 - 1].astype(jnp.float32)
            plan_scan("scatter_perm_L0", sc_body, perms)
            plan_scan("scatter_dup_L0", sc_body, dups)

            def sc_uniq_body(idx):
                out = jnp.full((m0 + 1,), 0, jnp.int32).at[idx].set(
                    vals, mode="drop", unique_indices=True)
                return out[0].astype(jnp.float32) + out[m0 - 1].astype(jnp.float32)
            plan_scan("scatter_uniq_L0", sc_uniq_body, perms)

            shifted = jnp.stack([(jnp.arange(m0, dtype=jnp.int32) + k) % m0
                                 for k in range(2)])

            def sc_sortuniq_body(idx):
                out = jnp.full((m0 + 1,), 0, jnp.int32).at[idx].set(
                    vals, mode="drop", unique_indices=True, indices_are_sorted=True)
                return out[0].astype(jnp.float32) + out[m0 - 1].astype(jnp.float32)
            plan_scan("scatter_sortuniq_L0", sc_sortuniq_body, shifted)
            plan_scan("gather_perm_L0",
                      lambda idx: vals[idx][0].astype(jnp.float32)
                      + vals[idx][m0 - 1].astype(jnp.float32), perms)

    if "convs" in WHAT:
        # per-level subm conv fwd / fwd+bwd micro-benches on real tables
        from tpu3dwsis.ops import sparse_conv

        channels = [32, 64, 96, 128, 160]
        plan0 = pres[0].plan
        for lv in range(len(plan0.levels)):
            c = channels[lv]
            lp = plan0.levels[lv]
            m = lp.subm_nbr.shape[1]
            key = jax.random.PRNGKey(lv)
            x2 = jax.random.normal(key, (2, m, c), jnp.bfloat16)
            w = jax.random.normal(key, (27, c, c), jnp.bfloat16) * 0.05

            @jax.jit
            def run_subm(x2, nbr, w):
                def body(acc, i):
                    x = jax.lax.dynamic_index_in_dim(x2, i % 2, keepdims=False)
                    out = sparse_conv.subm_conv(x, nbr, w)
                    return acc + out[0, 0].astype(jnp.float32), None
                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
                return acc
            timed_scan(f"subm_fwd_L{lv}_c{c}_m{m}", run_subm, x2, lp.subm_nbr, w)

            @jax.jit
            def run_subm_g(x2, nbr, w):
                def one(x, w):
                    return jnp.sum(sparse_conv.subm_conv(x, nbr, w).astype(jnp.float32))

                def body(acc, i):
                    x = jax.lax.dynamic_index_in_dim(x2, i % 2, keepdims=False)
                    gx, gw = jax.grad(one, argnums=(0, 1))(x, w)
                    return acc + gx[0, 0].astype(jnp.float32) + gw[0, 0, 0].astype(jnp.float32), None
                acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
                return acc
            timed_scan(f"subm_grad_L{lv}_c{c}_m{m}", run_subm_g, x2, lp.subm_nbr, w)

        # down + inverse conv at the L0->L1 transition
        lp0 = plan0.levels[0]
        c_in, c_out = 32, 64
        m_fine = lp0.subm_nbr.shape[1]
        m_coarse = lp0.down_nbr.shape[1]
        key = jax.random.PRNGKey(99)
        xf2 = jax.random.normal(key, (2, m_fine, c_in), jnp.bfloat16)
        wd = jax.random.normal(key, (8, c_in, c_out), jnp.bfloat16) * 0.05

        @jax.jit
        def run_down_g(xf2, w):
            def one(x, w):
                out = sparse_conv.down_conv(x, lp0.down_nbr, lp0.parent, lp0.child_offset, w)
                return jnp.sum(out.astype(jnp.float32))

            def body(acc, i):
                x = jax.lax.dynamic_index_in_dim(xf2, i % 2, keepdims=False)
                gx, gw = jax.grad(one, argnums=(0, 1))(x, w)
                return acc + gx[0, 0].astype(jnp.float32) + gw[0, 0, 0].astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
            return acc
        timed_scan(f"down_grad_L0_m{m_coarse}", run_down_g, xf2, wd)

        xc2 = jax.random.normal(key, (2, m_coarse, c_out), jnp.bfloat16)
        wi = jax.random.normal(key, (8, c_out, c_in), jnp.bfloat16) * 0.05

        @jax.jit
        def run_inv_g(xc2, w):
            def one(x, w):
                out = sparse_conv.inverse_conv(x, lp0.parent, lp0.child_offset, lp0.down_nbr, w)
                return jnp.sum(out.astype(jnp.float32))

            def body(acc, i):
                x = jax.lax.dynamic_index_in_dim(xc2, i % 2, keepdims=False)
                gx, gw = jax.grad(one, argnums=(0, 1))(x, w)
                return acc + gx[0, 0].astype(jnp.float32) + gw[0, 0, 0].astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
            return acc
        timed_scan(f"inv_grad_L0_m{m_fine}", run_inv_g, xc2, wi)

    print(json.dumps({"summary": {k: round(v, 1) for k, v in results.items()},
                      "batch": BATCH, "steps": STEPS}))


if __name__ == "__main__":
    main()
