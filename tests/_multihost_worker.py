"""Worker for tests/test_multihost.py: one of two jax.distributed processes.

Runs one data-parallel train step on a 2-process CPU "cluster" (1 device per
process, Gloo collectives) through the real multi-host path:
host_scene_shard -> per-host collate -> rebase/global_batch -> jitted step
over the global mesh.  Process 0 writes loss + a param checksum to a json
file for the pytest parent to compare against a single-device reference.
"""
import json
import os
import sys

os.environ.pop("XLA_FLAGS", None)  # exactly one CPU device per process
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]

    from tpu3dwsis.dist.launch import (
        global_batch,
        host_scene_shard,
        initialize,
        scale_statics,
    )

    initialize(f"localhost:{port}", num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 1

    from tests.test_multihost import build_fixture, run_step_single

    scenes, statics, model, loss_cfg, flags = build_fixture()
    local_scenes = host_scene_shard(scenes)
    assert len(local_scenes) == 2

    from tpu3dwsis.data.collate import collate
    from tpu3dwsis.dist.mesh import make_mesh

    import numpy as np

    labels = [build_fixture.labels_for(s) for s in local_scenes]
    arrays = collate(
        local_scenes, labels, statics, np.random.default_rng(0), training=False
    )

    mesh = make_mesh()
    assert mesh.devices.size == 2
    gstatics = scale_statics(statics, 2)
    batch = global_batch(arrays, mesh, statics)

    loss, checksum = run_step_single(model, gstatics, loss_cfg, flags, batch)
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"loss": loss, "checksum": checksum}, f)


if __name__ == "__main__":
    main()
