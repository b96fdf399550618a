"""Fast single-file npz checkpoint format: weak-label sidecar round-trip.

The orbax path is exercised by the multi-host tests; the npz fast path
(single-process default since round 4 — orbax's chunked commit measured
2030 s per 161 MiB on this 1-core VM) is covered for full TrainState
checkpoints by ``test_curriculum.py``; this covers the weak-only sidecar +
``load_weak_from_checkpoint`` (reference resume: ``train_scannetv2.py:673-693``,
which silently DROPS the propagated labels — ours must not)."""
import numpy as np

from tpu3dwsis.data.synthetic import make_scene
from tpu3dwsis.data.weak_labels import WeakLabelStore
from tpu3dwsis.train.checkpoint import load_weak_from_checkpoint, save_weak_sidecar


def _store():
    scene = make_scene(seed=3, num_instances=5, points_per_instance=150, num_background=500)
    store = WeakLabelStore({scene.name: scene}, classes=20)
    store.acquire(np.random.default_rng(0), annotation_num=1)
    return scene, store


def test_weak_sidecar_npz_roundtrip(tmp_path):
    scene, store = _store()
    # mutate past acquisition so the round-trip covers propagated state too
    s = scene.num_superpoints
    sp_pred = scene.sp_sem_gt.copy()
    aff = np.full((s, s), 1e-4)
    np.fill_diagonal(aff, 1.0)
    for u, v in scene.edges:
        if scene.sp_ins_gt[u] == scene.sp_ins_gt[v] and scene.sp_ins_gt[u] != -100:
            aff[u, v] = 1.0
    store.propagate(scene.name, np.ones(s), sp_pred, aff, iterations_num=2)
    store.derive_point_labels()

    p = str(tmp_path / "ck")
    save_weak_sidecar(p, 0, store)

    scene2, store2 = _store()
    before = store2.label_stats()
    assert load_weak_from_checkpoint(f"{p}_weak0", store2)
    assert store2.label_stats() == store.label_stats() != before

    a, b = store.states[scene.name], store2.states[scene.name]
    np.testing.assert_array_equal(a.point_sem, b.point_sem)
    np.testing.assert_array_equal(a.point_ins, b.point_ins)
    np.testing.assert_array_equal(a.cur_sem, b.cur_sem)
    np.testing.assert_array_equal(a.cur_ins, b.cur_ins)
