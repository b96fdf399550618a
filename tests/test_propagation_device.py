"""Device label propagation must match the host (reference-semantics) path."""
import jax.numpy as jnp
import numpy as np

from tpu3dwsis.data.scene import IGNORE
from tpu3dwsis.data.synthetic import make_scene
from tpu3dwsis.data.weak_labels import WeakLabelStore
from tpu3dwsis.ops.propagation import propagate_labels_device


def test_device_propagation_matches_host():
    scene = make_scene(seed=11, num_instances=4, points_per_instance=120, num_background=400)
    store = WeakLabelStore({scene.name: scene}, classes=20)
    store.acquire(np.random.default_rng(0))
    st = store.states[scene.name]
    s = scene.num_superpoints

    rng = np.random.default_rng(1)
    sp_value = rng.uniform(0.5, 1.0, s)
    sp_pred = scene.sp_sem_gt.copy()
    sp_pred[sp_pred == IGNORE] = 0
    aff = np.zeros((s, s))
    aff[scene.edges[:, 0], scene.edges[:, 1]] = rng.uniform(0.1, 1.0, len(scene.edges))
    np.fill_diagonal(aff, 1.0)

    # ---- host path ----
    store.propagate(scene.name, sp_value, sp_pred, aff, iterations_num=1)
    host_sem = st.cur_sem.copy()
    host_ins = st.cur_ins.copy()

    # ---- device path (padded) ----
    s_pad = 1 << int(np.ceil(np.log2(s)))
    pad = lambda a, fill: np.concatenate([a, np.full((s_pad - s, *a.shape[1:]), fill, a.dtype)])
    aff_p = np.zeros((s_pad, s_pad), np.float32)
    aff_p[:s, :s] = aff
    adj_p = np.zeros((s_pad, s_pad), np.float32)
    adj_p[scene.edges[:, 0], scene.edges[:, 1]] = 1.0
    seed_idx, score = propagate_labels_device(
        jnp.asarray(aff_p),
        jnp.asarray(adj_p),
        jnp.asarray(pad(st.base_sem, IGNORE)),
        jnp.asarray(pad(sp_pred.astype(np.int32), 0)),
        jnp.asarray(pad(sp_value.astype(np.float32), 0.0)),
        jnp.asarray(np.arange(s_pad) < s),
        num_classes=20,
        iterations=1,
    )
    seed_idx = np.asarray(seed_idx)[:s]
    score = np.asarray(score)[:s]

    dev_sem = st.base_sem.copy()
    dev_ins = st.base_ins.copy()
    assign = (score != 0) & (st.base_sem == IGNORE)
    dev_sem[assign] = st.base_sem[seed_idx[assign]]
    dev_ins[assign] = st.base_ins[seed_idx[assign]]

    np.testing.assert_array_equal(dev_sem, host_sem)
    np.testing.assert_array_equal(dev_ins, host_ins)
