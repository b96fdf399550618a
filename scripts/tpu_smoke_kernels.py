#!/usr/bin/env python
"""Compile-and-run every Pallas kernel path the train step uses, on the real
TPU, at small shapes — a ~3-minute Mosaic gate before committing to a 30-min
full-step compile.  Interpret-mode CPU tests cannot catch Mosaic lowering
errors (e.g. the packed-bf16 ``cmpf`` the fused backward hit: "Target does
not support this comparison"), so every new kernel path must pass here
BEFORE a long TPU job queues behind it.

Covers, in the train step's bf16 dtype: band-merge plan construction
(``build_subm_table``/``build_unet_plan``), unfused subm conv fwd+bwd,
fused BN+ReLU subm conv fwd+bwd (packed C=32/64 and unpacked C=96/160),
down conv fwd+bwd, and inverse conv fwd+bwd.  Each output is sanity-checked
against the XLA oracle at loose bf16 tolerance.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu3dwsis.ops import hashgrid
from tpu3dwsis.ops import sparse_conv as sc
from tpu3dwsis.ops.rulebook import VoxelLevel, build_subm_table, build_unet_plan
from tpu3dwsis.utils.profiling import enable_compilation_cache

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")
enable_compilation_cache(os.path.join(CACHE, "jax"))

DT = jnp.bfloat16


def check(name, got, ref, tol):
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    err = np.max(np.abs(got - ref)) / max(1e-6, float(np.max(np.abs(ref))))
    status = "ok" if (err < tol and np.isfinite(got).all()) else "FAIL"
    print(f"# {name}: rel_err={err:.2e} {status}", flush=True)
    return status == "ok"


def make_level(m, rng, shape=(64, 64, 64)):
    pts = rng.integers(0, shape[0], size=(m * 2, 3)).astype(np.int64)
    keys = np.unique(pts[:, 0] * shape[1] * shape[2] + pts[:, 1] * shape[2] + pts[:, 2])[
        : m - 1
    ].astype(np.int32)
    keys_pad = np.full(m, hashgrid.PAD_KEY, np.int32)
    keys_pad[: len(keys)] = np.sort(keys)
    valid = keys_pad != hashgrid.PAD_KEY
    cc = np.asarray(hashgrid.unpack_coords(jnp.where(valid, keys_pad, 0), shape, 1))
    return VoxelLevel(jnp.asarray(keys_pad), jnp.asarray(cc), jnp.asarray(valid)), shape


def main():
    print(f"# devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    ok = True
    m = 4096
    level, shape = make_level(m, rng)

    t0 = time.time()
    nbr = jax.jit(lambda lv: build_subm_table(lv, shape, 1))(level)
    nbr.block_until_ready()
    print(f"# band-merge build_subm_table compiled+ran in {time.time()-t0:.1f}s", flush=True)

    # full plan (band kernel across levels + down tables + inversion)
    t0 = time.time()
    plan = jax.jit(
        lambda lv: build_unet_plan(lv, shape, 1, 3, (m, m // 2, m // 4))
    )(level)
    jax.block_until_ready(plan)
    print(f"# band-merge build_unet_plan compiled+ran in {time.time()-t0:.1f}s", flush=True)

    for c in (32, 64, 96, 160):
        feats = jnp.asarray(rng.standard_normal((m, c)), DT)
        w = jnp.asarray(rng.standard_normal((27, c, c)) * 0.1, DT)
        g = jnp.asarray(rng.standard_normal((m, c)), DT)
        s = jnp.asarray(rng.standard_normal(c) * 0.5 + 1.0, jnp.float32)
        t = jnp.asarray(rng.standard_normal(c) * 0.2, jnp.float32)

        t0 = time.time()
        out = jax.jit(sc.subm_conv)(feats, nbr, w)
        ref = jax.jit(sc.gather_conv)(feats, nbr, w)
        ok &= check(f"subm_fwd_c{c}", out, ref, 0.05)

        def loss_unfused(feats, w):
            return jnp.sum(sc.subm_conv(feats, nbr, w).astype(jnp.float32) * g.astype(jnp.float32))

        def loss_oracle(feats, w):
            return jnp.sum(sc.gather_conv(feats, nbr, w).astype(jnp.float32) * g.astype(jnp.float32))

        dx, dw = jax.jit(jax.grad(loss_unfused, argnums=(0, 1)))(feats, w)
        dx_r, dw_r = jax.jit(jax.grad(loss_oracle, argnums=(0, 1)))(feats, w)
        ok &= check(f"subm_bwd_dx_c{c}", dx, dx_r, 0.05)
        ok &= check(f"subm_bwd_dw_c{c}", dw, dw_r, 0.05)

        # fused BN+ReLU path, both affine dtypes seen in the real graph
        for st_dt, tag in ((jnp.float32, "f32"), (DT, "bf16")):
            ss, tt = s.astype(st_dt), t.astype(st_dt)

            def loss_fused(feats, ss, tt, w):
                y = sc.subm_conv_bnrelu(feats, ss, tt, nbr, w)
                return jnp.sum(y.astype(jnp.float32) * g.astype(jnp.float32))

            def bnrelu_ref(f, a, b):
                # f32 affine rounded to the conv dtype — the semantics
                # subm_conv_bnrelu defines (a bf16 affine flips the ReLU
                # mask near zero, which shows up as full |dh*s| dx errors)
                return jax.nn.relu(
                    f.astype(jnp.float32) * a[None].astype(jnp.float32)
                    + b[None].astype(jnp.float32)
                ).astype(f.dtype)

            def loss_fused_ref(feats, ss, tt, w):
                y = sc.gather_conv(bnrelu_ref(feats, ss, tt), nbr, w)
                return jnp.sum(y.astype(jnp.float32) * g.astype(jnp.float32))

            yf = jax.jit(lambda f, a, b, w: sc.subm_conv_bnrelu(f, a, b, nbr, w))(feats, ss, tt, w)
            yr = jax.jit(
                lambda f, a, b, w: sc.gather_conv(bnrelu_ref(f, a, b), nbr, w)
            )(feats, ss, tt, w)
            ok &= check(f"fused_fwd_c{c}_{tag}", yf, yr, 0.05)
            gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))(feats, ss, tt, w)
            gr = jax.jit(jax.grad(loss_fused_ref, argnums=(0, 1, 2, 3)))(feats, ss, tt, w)
            for name, a, b in zip(("dx", "ds", "dt", "dw"), gf, gr):
                ok &= check(f"fused_bwd_{name}_c{c}_{tag}", a, b, 0.08)
        print(f"# c={c} done in {time.time()-t0:.1f}s", flush=True)

    # down + inverse convs at L0→L1 via the real plan
    lp = plan.levels[0]
    c = 32
    feats = jnp.asarray(rng.standard_normal((lp.subm_nbr.shape[1], c)), DT)
    wd = jnp.asarray(rng.standard_normal((8, c, c)) * 0.1, DT)
    m1 = plan.levels[1].subm_nbr.shape[1]
    gd = jnp.asarray(rng.standard_normal((m1, c)), DT)

    t0 = time.time()

    def loss_down(feats, wd):
        y = sc.down_conv(feats, lp.down_nbr, lp.parent, lp.child_offset, wd)
        return jnp.sum(y.astype(jnp.float32) * gd.astype(jnp.float32))

    def loss_down_ref(feats, wd):
        y = sc.gather_conv(feats, lp.down_nbr, wd)
        return jnp.sum(y.astype(jnp.float32) * gd.astype(jnp.float32))

    yd = jax.jit(lambda f, w: sc.down_conv(f, lp.down_nbr, lp.parent, lp.child_offset, w))(feats, wd)
    yr = jax.jit(lambda f, w: sc.gather_conv(f, lp.down_nbr, w))(feats, wd)
    ok &= check("down_fwd", yd, yr, 0.05)
    gf = jax.jit(jax.grad(loss_down, argnums=(0, 1)))(feats, wd)
    gr = jax.jit(jax.grad(loss_down_ref, argnums=(0, 1)))(feats, wd)
    ok &= check("down_bwd_dx", gf[0], gr[0], 0.05)
    ok &= check("down_bwd_dw", gf[1], gr[1], 0.05)
    print(f"# down conv done in {time.time()-t0:.1f}s", flush=True)

    # inverse conv (coarse→fine)
    t0 = time.time()
    fc = jnp.asarray(rng.standard_normal((m1, c)), DT)
    wi = jnp.asarray(rng.standard_normal((8, c, c)) * 0.1, DT)
    gi = jnp.asarray(rng.standard_normal((lp.subm_nbr.shape[1], c)), DT)

    def loss_inv(fc, wi):
        y = sc.inverse_conv(fc, lp.parent, lp.child_offset, lp.down_nbr, wi)
        return jnp.sum(y.astype(jnp.float32) * gi.astype(jnp.float32))

    def loss_inv_ref(fc, wi):
        y = sc.inverse_conv_raw(fc, lp.parent, lp.child_offset, wi)
        return jnp.sum(y.astype(jnp.float32) * gi.astype(jnp.float32))

    yi = jax.jit(lambda f, w: sc.inverse_conv(f, lp.parent, lp.child_offset, lp.down_nbr, w))(fc, wi)
    yir = jax.jit(lambda f, w: sc.inverse_conv_raw(f, lp.parent, lp.child_offset, w))(fc, wi)
    ok &= check("inv_fwd", yi, yir, 0.05)
    gf = jax.jit(jax.grad(loss_inv, argnums=(0, 1)))(fc, wi)
    gr = jax.jit(jax.grad(loss_inv_ref, argnums=(0, 1)))(fc, wi)
    ok &= check("inv_bwd_dx", gf[0], gr[0], 0.05)
    ok &= check("inv_bwd_dw", gf[1], gr[1], 0.05)
    print(f"# inverse conv done in {time.time()-t0:.1f}s", flush=True)

    print("# SMOKE " + ("PASS" if ok else "FAIL"), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
