"""Why does an npz RESUME recompile the train step (~25 min) while the live
process hits the persistent compile cache?  (NEXT.md open question.)

CPU probe: build a tiny trainer, jit-lower the step with (a) the live
mid-stage state and (b) the same state round-tripped through the npz
checkpoint, then compare the lowered StableHLO text and JAX's persistent
compile-cache keys.  If the HLO differs, diff it; if only the cache key
differs, the miss is in compile options / layouts.

Run: JAX_PLATFORMS='' python scripts/dbg_resume_key.py   (conftest-free)
"""
import hashlib
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu3dwsis.core.containers import BatchStatics
from tpu3dwsis.data.loader import SceneDataset, batch_iterator
from tpu3dwsis.data.synthetic import make_scene
from tpu3dwsis.data.weak_labels import WeakLabelStore
from tpu3dwsis.nn.losses import LossFlags
from tpu3dwsis.nn.network import NetConfig, WSISNet
from tpu3dwsis.train.checkpoint import load_checkpoint, save_checkpoint
from tpu3dwsis.train.curriculum import CurriculumConfig, Trainer
from tpu3dwsis.train.optim import make_optimizer
from tpu3dwsis.train.step import make_train_step
from tpu3dwsis.data.collate import to_scene_batch


def build_world(log_dir):
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
        log_dir=log_dir,
    )
    return model, statics, ds, cfg, store


def describe_leaves(tag, state):
    rows = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(state):
        kind = type(leaf).__name__
        committed = getattr(leaf, "_committed", None)
        weak = getattr(getattr(leaf, "aval", None), "weak_type", None)
        if not hasattr(leaf, "shape"):
            rows.append((jax.tree_util.keystr(path), kind, repr(leaf)))
        else:
            rows.append(
                (
                    jax.tree_util.keystr(path),
                    kind,
                    f"{np.dtype(leaf.dtype).name}{list(np.shape(leaf))}"
                    f" weak={weak} committed={committed}",
                )
            )
    print(f"--- {tag}: {len(rows)} leaves")
    return rows


def lower_fingerprint(step_fn_wrapped, state, batch):
    lowered = step_fn_wrapped.lower(state, batch)
    txt = lowered.as_text()
    h = hashlib.sha256(txt.encode()).hexdigest()[:16]
    # the persistent-cache key (what actually gates the 25-min compile)
    key = None
    try:
        from jax._src import cache_key as ck
        from jax._src import compiler

        backend = jax.devices()[0].client
        comp = lowered.compiler_ir()  # MLIR module (stablehlo)
        opts = compiler.get_compile_options(
            num_replicas=1, num_partitions=1
        )
        key = ck.get(comp, devices=np.array([[jax.devices()[0]]]),
                     compile_options=opts, backend=backend)
    except Exception as e:  # key derivation is best-effort across jax versions
        key = f"(cache_key failed: {e!r})"
    return txt, h, key


def main():
    log_dir = "/tmp/dbg_resume_key"
    os.makedirs(log_dir, exist_ok=True)
    model, statics, ds, cfg, store = build_world(log_dir)
    trainer = Trainer(model, statics, ds, cfg)
    trainer.init_state()

    tx = make_optimizer(
        trainer.state.params, base_lr=cfg.lr, weight_decay=cfg.weight_decay,
        max_epochs=2, steps_per_epoch=1, power=cfg.poly_power,
    )
    trainer.state = trainer.state.replace(
        opt_state=tx.init(trainer.state.params), step=0
    )
    flags = LossFlags(
        superpoint_losses=False, supervise_sp_offset=False,
        supervise_instance_size=False,
    )
    step_fn = make_train_step(model, tx, statics, trainer.loss_cfg, flags, donate=True)

    it = batch_iterator(ds, 2, np.random.default_rng(0), training=True)
    batch = to_scene_batch(next(it))

    # live: run one real step so the state is "mid-stage" device output
    live_state, _ = step_fn(trainer.state, batch)

    # checkpoint round-trip (exactly what propagation_curve.py does)
    save_checkpoint(os.path.join(log_dir, "ck"), live_state, {"stage": "semantic", "epoch": 1}, store)
    model2, statics2, ds2, cfg2, store2 = build_world(log_dir)
    trainer2 = Trainer(model2, statics2, ds2, cfg2)
    trainer2.init_state()
    restored, meta = load_checkpoint(os.path.join(log_dir, "ck"), trainer2.state, store2)

    live_rows = describe_leaves("live", live_state)
    rest_rows = describe_leaves("restored", restored)
    n_diff = 0
    for a, b in zip(live_rows, rest_rows):
        if a != b:
            n_diff += 1
            if n_diff <= 25:
                print(f"  LIVE {a}\n  REST {b}")
    print(f"leaf description diffs: {n_diff}")

    txt1, h1, k1 = lower_fingerprint(step_fn, live_state, batch)
    txt2, h2, k2 = lower_fingerprint(step_fn, restored, batch)
    print(f"HLO hash live={h1} restored={h2} equal={h1 == h2}")
    print(f"cache key live={k1}\ncache key rest={k2}\nequal={k1 == k2}")
    if h1 != h2:
        import difflib

        d = list(difflib.unified_diff(txt1.splitlines(), txt2.splitlines(), lineterm=""))
        print(f"HLO diff lines: {len(d)}")
        for line in d[:80]:
            print(line)


if __name__ == "__main__":
    main()
