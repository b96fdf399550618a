#!/usr/bin/env python
"""Row-level isolation of the fused-backward dx mismatch seen on real TPU
(smoke: fused_bwd_dx rel_err ~0.3-0.4 at c=32/64/96, pass at 160; interpret
mode is clean).  Compares, in f32 at c=32:

  A) dx from the fused kernel backward         subm_conv_bwd(..., affine)
  B) mask*s*(unfused kernel backward dx of h)  — same window math, epilogue
                                                 applied OUTSIDE the kernel
  C) autodiff oracle of the XLA composition

and reports which rows disagree (index ranges, tile positions, far rows).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tpu3dwsis.ops import hashgrid
from tpu3dwsis.ops import sparse_conv as sc
from tpu3dwsis.ops.pallas_spconv2 import subm_conv_bwd
from tpu3dwsis.ops.rulebook import VoxelLevel, build_subm_table
from tpu3dwsis.utils.profiling import enable_compilation_cache

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")
enable_compilation_cache(os.path.join(CACHE, "jax"))

TILE = int(os.environ.get("DBG_TILE", "512"))
WINDOW = int(os.environ.get("DBG_WINDOW", "512"))
C = int(os.environ.get("DBG_C", "32"))


def make_level(m, rng, shape=(64, 64, 64)):
    pts = rng.integers(0, shape[0], size=(m * 2, 3)).astype(np.int64)
    keys = np.unique(pts[:, 0] * shape[1] * shape[2] + pts[:, 1] * shape[2] + pts[:, 2])[
        : m - 1
    ].astype(np.int32)
    keys_pad = np.full(m, hashgrid.PAD_KEY, np.int32)
    keys_pad[: len(keys)] = np.sort(keys)
    valid = keys_pad != hashgrid.PAD_KEY
    cc = np.asarray(hashgrid.unpack_coords(jnp.where(valid, keys_pad, 0), shape, 1))
    return VoxelLevel(jnp.asarray(keys_pad), jnp.asarray(cc), jnp.asarray(valid))


def main():
    rng = np.random.default_rng(0)
    m, c = 4096, C
    nbr = build_subm_table(make_level(m, rng), (64, 64, 64), 1)
    nbr = jax.device_get(nbr)
    nbr = jnp.asarray(nbr)
    feats = jnp.asarray(rng.standard_normal((m, c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((27, c, c)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.standard_normal((m, c)), jnp.float32)
    s = jnp.asarray(rng.standard_normal(c) * 0.5 + 1.0, jnp.float32)
    t = jnp.asarray(rng.standard_normal(c) * 0.2, jnp.float32)

    kw = dict(tile=TILE, window=WINDOW)

    # A: fused kernel
    dxA, dwA, dsA, dtA = jax.jit(
        lambda f, gg, ww, ss, tt: subm_conv_bwd(f, gg, nbr, ww, affine=(ss, tt), **kw)
    )(feats, g, w, s, t)

    # B: unfused kernel on h, epilogue outside
    pre = feats * s[None] + t[None]
    h = jax.nn.relu(pre)
    mask = (pre > 0).astype(jnp.float32)
    dhB, dwB = jax.jit(lambda hh, gg, ww: subm_conv_bwd(hh, gg, nbr, ww, **kw))(h, g, w)
    dxB = dhB * mask * s[None]

    # C: oracle
    def loss(f, ss, tt, ww):
        hh = jax.nn.relu(f * ss[None] + tt[None])
        return jnp.sum(sc.gather_conv(hh, nbr, ww) * g)

    dxC, dsC, dtC, dwC = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))(feats, s, t, w)

    A, B, Cx = (np.asarray(x) for x in (dxA, dxB, dxC))
    scale = np.max(np.abs(Cx))
    for name, X in (("A_vs_C", A - Cx), ("B_vs_C", B - Cx), ("A_vs_B", A - B)):
        d = np.max(np.abs(X), axis=1) / scale
        bad = np.flatnonzero(d > 1e-3)
        print(f"# {name}: rel_max={d.max():.3e} bad_rows={len(bad)}", flush=True)
        if len(bad):
            print(f"#   first bad rows: {bad[:20].tolist()}", flush=True)
            print(f"#   bad row mod tile({TILE}): {sorted(set((bad % TILE).tolist()))[:20]}", flush=True)
            print(f"#   bad row // tile: {sorted(set((bad // TILE).tolist()))}", flush=True)
    # where are the far rows?
    nbr_np = np.asarray(nbr)
    print(f"# dw A_vs_C rel={np.max(np.abs(np.asarray(dwA)-np.asarray(dwC)))/np.max(np.abs(np.asarray(dwC))):.3e}", flush=True)
    print(f"# ds A_vs_C rel={np.max(np.abs(np.asarray(dsA)-np.asarray(dsC)))/np.max(np.abs(np.asarray(dsC))):.3e}", flush=True)
    print(f"# dt A_vs_C rel={np.max(np.abs(np.asarray(dtA)-np.asarray(dtC)))/np.max(np.abs(np.asarray(dtC))):.3e}", flush=True)


if __name__ == "__main__":
    main()
