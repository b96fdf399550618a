"""Weak-label state machine + BFS clustering behavioral tests."""
import numpy as np

from tpu3dwsis.data.scene import IGNORE
from tpu3dwsis.data.synthetic import make_scene
from tpu3dwsis.data.weak_labels import WeakLabelStore
from tpu3dwsis.infer.clustering import cluster_scene


def _store():
    scene = make_scene(seed=3, num_instances=5, points_per_instance=150, num_background=500)
    store = WeakLabelStore({scene.name: scene}, classes=20)
    store.acquire(np.random.default_rng(0), annotation_num=1)
    return scene, store


def test_acquire_one_superpoint_per_instance():
    scene, store = _store()
    st = store.states[scene.name]
    # exactly one labeled superpoint per instance (incl. the background group)
    labeled = np.where(st.base_ins != IGNORE)[0]
    ins_of_labeled = st.base_ins[labeled]
    assert len(np.unique(ins_of_labeled)) == len(ins_of_labeled)
    for ins in np.unique(scene.sp_ins_gt[scene.sp_ins_gt != IGNORE]):
        assert (ins_of_labeled == ins).sum() == 1
    # labeled sp keeps its GT mode labels
    for sp in labeled:
        assert st.base_sem[sp] == scene.sp_sem_gt[sp]
    # point-level weak labels only under labeled superpoints
    cover = np.isin(scene.superpoint, labeled)
    assert (st.point_sem[~cover] == IGNORE).all()
    assert (st.point_sem[cover] != IGNORE).all()


def test_propagation_with_oracle_predictions_expands_coverage():
    scene, store = _store()
    st = store.states[scene.name]
    before = (st.point_sem != IGNORE).mean()

    s = scene.num_superpoints
    # oracle network outputs: GT classes with full confidence, affinity=1 on
    # same-instance edges
    sp_value = np.ones(s)
    sp_pred = scene.sp_sem_gt.copy()
    aff = np.zeros((s, s))
    for u, v in scene.edges:
        same = (
            scene.sp_ins_gt[u] == scene.sp_ins_gt[v]
            and scene.sp_ins_gt[u] != IGNORE
        )
        aff[u, v] = 1.0 if same else 1e-4
    np.fill_diagonal(aff, 1.0)

    store.propagate(scene.name, sp_value, sp_pred, aff, iterations_num=2)
    store.derive_point_labels()
    after = (st.point_sem != IGNORE).mean()
    assert after > before

    stats = store.label_stats()
    assert stats["ins_accuracy"] > 0.9  # oracle affinity must stay accurate


def test_whole_scene_propagation_labels_everything_near_instances():
    scene, store = _store()
    s = scene.num_superpoints
    sp_pred = scene.sp_sem_gt.copy()
    sp_value = np.ones(s)
    store.propagate_to_whole_scene(
        scene.name, sp_value, sp_pred, scene.sp_offset_gt, match_radius=0.9
    )
    store.derive_point_labels(add_occupancy=True, add_instance_size=True)
    st = store.states[scene.name]
    # occupancy positive wherever instance labels exist
    lab = st.cur_ins != IGNORE
    assert (st.cur_occupancy[lab] > 0).all()
    assert st.cur_size.max() > 0
    stats = store.label_stats()
    assert stats["ins_coverage"] > 0.1
    assert stats["ins_accuracy"] > 0.8


def test_cluster_scene_recovers_instances_from_oracle_heads():
    scene = make_scene(seed=7, num_instances=4, points_per_instance=200, num_background=400)
    s = scene.num_superpoints
    sp_pred = scene.sp_sem_gt.copy()
    sp_pred[sp_pred == IGNORE] = 0
    offs = scene.sp_offset_gt
    occupancy = np.full(s, np.log(200.0))
    size = np.full(s, 2.0)  # generous radius so same-instance sps merge
    valid_mask = np.array([False, False] + [True] * 18)
    res = cluster_scene(
        scene.xyz,
        scene.superpoint,
        scene.edges,
        sp_pred,
        offs,
        occupancy,
        size,
        valid_mask,
        bfs_ratio=0.25,
    )
    assert len(res.confidences) >= 1
    assert (res.confidences <= 1.0).all() and (res.confidences > 0).all()
    # each predicted instance should be dominated by a single GT instance
    for k in range(len(res.confidences)):
        gt_in_mask = scene.ins[res.masks[k]]
        gt_in_mask = gt_in_mask[gt_in_mask != IGNORE]
        if len(gt_in_mask) == 0:
            continue
        vals, counts = np.unique(gt_in_mask, return_counts=True)
        assert counts.max() / counts.sum() > 0.7


def test_propagate_current_to_neighbor_extends_one_ring():
    scene, store = _store()
    st = store.states[scene.name]
    before = int((st.cur_sem != IGNORE).sum())
    sp_pred = scene.sp_sem_gt.copy()
    store.propagate_current_to_neighbor(scene.name, sp_pred)
    after = int((st.cur_sem != IGNORE).sum())
    assert after > before
    # newly labeled superpoints carry their seed's class and are graph
    # neighbors of a previously labeled superpoint of the same class
    newly = np.where((st.cur_sem != IGNORE) & (st.base_sem == IGNORE))[0]
    nbr_of = {}
    for u, v in scene.edges:
        nbr_of.setdefault(int(u), set()).add(int(v))
        nbr_of.setdefault(int(v), set()).add(int(u))
    labeled0 = set(np.where(st.base_sem != IGNORE)[0])
    for sp in newly[:20]:
        assert nbr_of.get(int(sp), set()) & labeled0


def test_count_voxels_exact_where_product_sum_hash_collides():
    from tpu3dwsis.infer.clustering import _count_voxels

    # voxel coords (0,0,4001) and (3730,3027,0) satisfy
    # 3730*73856093 + 3027*19349663 - 4001*83492791 == 0, so the reference
    # tests' product-sum hash maps both to ONE key; the exact packed count
    # must still see two voxels (this count drives the fragment/primary
    # split at fragment_ratio * occupancy).
    a, b, c = 73856093, 19349663, 83492791
    assert 3730 * a + 3027 * b - 4001 * c == 0
    scale = 50.0
    v = np.array([[0, 0, 4001], [3730, 3027, 0]], np.float64)
    xyz = (v + 0.5) / scale
    assert np.array_equal(np.floor(xyz * scale).astype(np.int64), v.astype(np.int64))
    assert _count_voxels(xyz, scale) == 2
    # degenerate cases
    assert _count_voxels(np.zeros((0, 3)), scale) == 0
    assert _count_voxels(np.array([[1.0, 2.0, 3.0]] * 5), scale) == 1
