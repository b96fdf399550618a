"""Multi-host data parallelism: 2 jax.distributed CPU processes == 1 device.

The reference's multi-node surface is DDP scaffolding that is never
initialized (``train_scannetv2.py:734-738``, ``utils/comm.py`` — SURVEY
§2.3); here multi-host is real: two OS processes form a Gloo-backed
jax.distributed cluster, each collates its own scene shard, and one jitted
train step runs over the global 2-device mesh.  The parent assembles the
identical global batch on one device (host-side concat of the same rebased
arrays) and asserts equal loss and post-update parameter checksum.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_fixture():
    """Scenes + per-host statics + a small model; shared with the worker."""
    from tpu3dwsis.core.buckets import fit_statics
    from tpu3dwsis.data.collate import SceneLabels
    from tpu3dwsis.data.synthetic import make_scene
    from tpu3dwsis.nn.losses import LossConfig, LossFlags
    from tpu3dwsis.nn.network import NetConfig, WSISNet

    scenes = [
        make_scene(seed=i, num_instances=3, points_per_instance=60, num_background=150)
        for i in range(4)
    ]
    statics = fit_statics(
        scenes, batch_size=2, num_levels=3, max_instances=8, aug_margin=(1.0, 1.0, 1.0)
    )
    model = WSISNet(NetConfig(classes=20, media=8, blocks=3, block_reps=1))
    loss_cfg = LossConfig(
        classes=20, max_instances=8, num_scenes=statics.max_batch * 2
    )
    flags = LossFlags(True, True, True)
    return scenes, statics, model, loss_cfg, flags


def _labels_for(scene):
    from tpu3dwsis.data.collate import SceneLabels

    return SceneLabels(
        point_sem=scene.sem,
        point_ins=scene.ins,
        sp_sem=scene.sp_sem_gt,
        sp_ins=scene.sp_ins_gt,
        sp_offset=scene.sp_offset_gt,
        sp_occupancy=np.full(scene.num_superpoints, 20.0, np.float32),
        sp_size=np.ones(scene.num_superpoints, np.float32),
    )


build_fixture.labels_for = _labels_for


def run_step_single(model, statics, loss_cfg, flags, batch):
    """Init + one train step fully inside one jit (required in multi-process
    mode: eager ops on non-addressable global arrays are illegal)."""
    import jax
    import jax.numpy as jnp

    from tpu3dwsis.nn.network import preprocess
    from tpu3dwsis.train.optim import make_optimizer
    from tpu3dwsis.train.state import init_train_state
    from tpu3dwsis.train.step import make_train_step

    @jax.jit
    def all_in_one(batch):
        pre = preprocess(batch, statics, use_coords=model.cfg.use_coords)
        variables = model.init(jax.random.PRNGKey(0), batch, pre, train=False)
        tx = make_optimizer(variables["params"])
        state = init_train_state(variables["params"], variables["batch_stats"], tx)
        step = make_train_step(model, tx, statics, loss_cfg, flags, jit=False)
        new_state, loss_out = step(state, batch)
        checksum = sum(
            jnp.sum(jnp.abs(l.astype(jnp.float32)))
            for l in jax.tree_util.tree_leaves(new_state.params)
        )
        return loss_out["loss"], checksum

    loss, cs = all_in_one(batch)
    return float(loss), float(cs)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_step_matches_single_device(tmp_path):
    from tpu3dwsis.data.collate import collate, to_scene_batch
    from tpu3dwsis.dist.launch import rebase_arrays, scale_statics

    scenes, statics, model, loss_cfg, flags = build_fixture()

    # ---- single-device reference: the same two host shards, rebased and
    # concatenated on the host exactly as global_batch lays them out
    # (host_scene_shard's round-robin with k=2 gives [0,2] / [1,3]) ----
    shards = [scenes[0::2], scenes[1::2]]
    locals_ = [
        rebase_arrays(
            collate(sh, [_labels_for(s) for s in sh], statics, np.random.default_rng(0),
                    training=False),
            statics, host, 2,
        )
        for host, sh in enumerate(shards)
    ]
    from tpu3dwsis.core.containers import SceneBatch

    concat = {
        f: np.concatenate([locals_[0][f], locals_[1][f]], axis=0)
        for f in SceneBatch._fields
        if not f.startswith("hp_")  # host-local plan tables never globalize
    }
    gstatics = scale_statics(statics, 2)
    ref_loss, ref_cs = run_step_single(
        model, gstatics, loss_cfg, flags, to_scene_batch(concat)
    )
    assert np.isfinite(ref_loss)

    # ---- 2-process run ----
    port = _free_port()
    out_path = tmp_path / "proc0.json"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "_multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), str(out_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"
    with open(out_path) as f:
        got = json.load(f)

    assert np.isclose(got["loss"], ref_loss, rtol=1e-3), (got, ref_loss)
    assert np.isclose(got["checksum"], ref_cs, rtol=1e-3), (got, ref_cs)


def test_global_batch_globalizes_training_collate():
    """A training collate must flow through global_batch with every field
    globalized (regression guard descended from the r3 multi-host break;
    the host-plan variant that originally triggered it was removed in r5)."""
    import jax
    from jax.sharding import Mesh

    from tpu3dwsis.data.collate import collate
    from tpu3dwsis.dist.launch import global_batch

    scenes, statics, model, loss_cfg, flags = build_fixture()
    arrays = collate(
        scenes[:2],
        [_labels_for(s) for s in scenes[:2]],
        statics,
        np.random.default_rng(0),
        training=True,
    )
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    batch = global_batch(
        {k: v for k, v in arrays.items() if not k.startswith("_")},
        mesh,
        statics,
        process_index=0,
    )
    assert batch.point_coords.shape[0] == statics.max_points


def test_global_batch_missing_required_field_raises():
    """Non-hp_* fields must hard-KeyError when absent (ADVICE r3)."""
    import jax
    import pytest
    from jax.sharding import Mesh

    from tpu3dwsis.data.collate import collate
    from tpu3dwsis.dist.launch import global_batch

    scenes, statics, model, loss_cfg, flags = build_fixture()
    arrays = collate(
        scenes[:2],
        [_labels_for(s) for s in scenes[:2]],
        statics,
        np.random.default_rng(0),
        training=False,
    )
    arrays = {k: v for k, v in arrays.items() if not k.startswith("_")}
    del arrays["edge_feats"]
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    with pytest.raises(KeyError):
        global_batch(arrays, mesh, statics, process_index=0)
