#!/usr/bin/env python
"""Regenerate every deterministic scene cache after a container restart.

Seeds are fixed, so the regenerated .npz files have identical shapes and
contents to the wiped ones — jit cache keys (which depend on fit_statics
over these scenes) are preserved.  CPU-only: scene synthesis never touches
jax, so this can run while a TPU job holds the chip.

Covers: bench rooms 0..19 (bench.py batch 6 uses 0..11, batch 10 uses
0..19), propagation train rooms prop_room_800_0..47, and the round-4
32-room val split prop_val_800_0..31 (VERDICT r3 #9).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")


def build(prefix, count, seed0, density=None):
    from tpu3dwsis.data.scene import save_scene
    from tpu3dwsis.data.synthetic import make_room_scene

    for i in range(count):
        path = os.path.join(CACHE, f"{prefix}_{i}.npz")
        if os.path.exists(path):
            continue
        t0 = time.time()
        kw = {} if density is None else {"density": density}
        sc = make_room_scene(seed=seed0 + i, **kw)
        save_scene(sc, path)
        print(f"{path}: {sc.num_points} pts ({time.time()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    os.makedirs(CACHE, exist_ok=True)
    build("bench_room", 20, 0)
    build("prop_room_800", 48, 0, density=800.0)
    build("prop_val_800", 32, 5000, density=800.0)
    print("ALL SCENES READY", flush=True)
