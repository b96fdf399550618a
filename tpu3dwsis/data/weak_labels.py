"""Weak-label state machine: acquisition, affinity-based propagation, and
whole-scene pseudo-instance generation.

Host-side (numpy) re-implementation of the curriculum machinery the
reference keeps inside its Dataset classes:

* ``acquire_weak_label`` — draw ``annotation_num`` superpoints per instance,
  point-count weighted, erase all other labels
  (``modules/datasets/scannetv2_dataset.py:970-1036``);
* ``_weak_label_spg_init`` edge labels (``:491-512``) — kept implicitly (we
  derive edge agreement on demand; the training loss never consumes it);
* ``weak_label_propagation`` — per-class transition matrix ``T = affinity ∘
  (A+I) ∘ semantic-gate`` row-normalized and powered, argmax over seed rows
  (``:664-777``);
* ``extend_label_to_neighbor`` (``:780-821``) and
  ``propagate_label_to_whole_scene`` — offset-predicted centers matched to
  prior instance centers within ``0.9`` m (``:873-967``);
* ``generate_point_level_weak_label`` + occupancy (unique voxel counts per
  instance, ``cal_occupancy :515-542``) + instance size (max offset norm per
  instance, ``cal_instance_size :545-564``).

Unlike the reference, the whole state is explicit and serializable (the
reference loses pseudo-labels on resume — SURVEY §5.4); see
:func:`state_to_arrays` / :func:`state_from_arrays`.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

from .scene import IGNORE, Scene

__all__ = ["SceneWeakState", "WeakLabelStore"]


@dataclasses.dataclass
class SceneWeakState:
    """Weak/pseudo labels for one scene.

    ``base_*`` = the annotation-time weak graph (fixed after acquisition;
    the reference's ``superpoints_graph``); ``cur_*`` = the evolving pseudo
    label graph (the reference's ``weak_label_spg``).
    """

    base_sem: np.ndarray
    base_ins: np.ndarray
    base_offset: np.ndarray
    cur_sem: np.ndarray
    cur_ins: np.ndarray
    cur_offset: np.ndarray
    cur_occupancy: np.ndarray  # raw instance voxel counts per superpoint
    cur_size: np.ndarray
    point_sem: np.ndarray
    point_ins: np.ndarray


def _sp_centers(scene: Scene) -> np.ndarray:
    s = scene.num_superpoints
    cent = np.zeros((s, 3))
    cnt = np.bincount(scene.superpoint, minlength=s).astype(np.float64)
    for d in range(3):
        cent[:, d] = np.bincount(scene.superpoint, weights=scene.xyz[:, d], minlength=s)
    return cent / np.maximum(cnt, 1)[:, None]


class WeakLabelStore:
    """Holds and mutates the weak-label state of every training scene."""

    def __init__(self, scenes: Dict[str, Scene], classes: int = 20, scale: float = 50.0):
        self.scenes = scenes
        self.classes = classes
        self.scale = scale
        self.states: Dict[str, SceneWeakState] = {}
        self._centers: Dict[str, np.ndarray] = {
            name: _sp_centers(sc) for name, sc in scenes.items()
        }
        self._adj: Dict[str, np.ndarray] = {}

    # ------------------------------------------------------------------ init
    def acquire(self, rng: np.random.Generator, annotation_num: int = 1):
        """Draw the weak annotations (``acquire_weak_label``, ``:970-1036``)."""
        for name, scene in self.scenes.items():
            s = scene.num_superpoints
            sp_sem = scene.sp_sem_gt.copy()
            sp_ins = scene.sp_ins_gt.copy()
            sp_count = np.bincount(scene.superpoint, minlength=s).astype(np.float64)
            centers = self._centers[name]

            chosen: list[int] = []
            offset = np.zeros((s, 3), np.float32)
            for ins_label in np.unique(scene.ins):
                sp_of_ins = np.where(sp_ins == ins_label)[0]
                if len(sp_of_ins) == 0:
                    continue
                if annotation_num < len(sp_of_ins):
                    p = sp_count[sp_of_ins] / sp_count[sp_of_ins].sum()
                    pick = rng.choice(sp_of_ins, size=annotation_num, p=p, replace=False)
                else:
                    pick = sp_of_ins
                chosen.extend(int(x) for x in pick)
                # instance center estimated from the chosen superpoints only
                mask = np.isin(scene.superpoint, pick)
                ins_center = scene.xyz[mask].mean(0)
                for sp_id in pick:
                    offset[sp_id] = ins_center - centers[sp_id]

            chosen_mask = np.zeros(s, bool)
            chosen_mask[chosen] = True
            base_sem = np.where(chosen_mask, sp_sem, IGNORE).astype(np.int32)
            base_ins = np.where(chosen_mask, sp_ins, IGNORE).astype(np.int32)
            base_offset = np.where(chosen_mask[:, None], offset, 0.0).astype(np.float32)

            self.states[name] = SceneWeakState(
                base_sem=base_sem,
                base_ins=base_ins,
                base_offset=base_offset,
                cur_sem=base_sem.copy(),
                cur_ins=base_ins.copy(),
                cur_offset=base_offset.copy(),
                cur_occupancy=np.zeros(s, np.float32),
                cur_size=np.zeros(s, np.float32),
                point_sem=np.full(scene.num_points, IGNORE, np.int32),
                point_ins=np.full(scene.num_points, IGNORE, np.int32),
            )
        self.derive_point_labels()

    # ------------------------------------------------- derived point labels
    def derive_point_labels(self, add_occupancy=False, add_instance_size=False):
        """``generate_point_level_weak_label`` (``:568-597``) + occupancy /
        size signals (``:515-564``)."""
        for name, scene in self.scenes.items():
            st = self.states[name]
            labeled = (st.cur_sem != IGNORE) & (st.cur_ins != IGNORE)
            sp = scene.superpoint
            lab_p = labeled[sp]
            st.point_sem = np.where(lab_p, st.cur_sem[sp], IGNORE).astype(np.int32)
            st.point_ins = np.where(lab_p, st.cur_ins[sp], IGNORE).astype(np.int32)

            s = scene.num_superpoints
            if add_occupancy:
                # unique voxel count of each superpoint's instance (:515-542)
                coords = (scene.xyz * self.scale).astype(np.int64)
                key = (
                    (coords[:, 0] - coords[:, 0].min()) * 2097152
                    + (coords[:, 1] - coords[:, 1].min()) * 2048
                    + (coords[:, 2] - coords[:, 2].min())
                )
                _, p2v = np.unique(key, return_inverse=True)
                occ_of_ins: Dict[int, int] = {}
                occ = np.zeros(s, np.float32)
                for sp_id in range(s):
                    ins = int(st.cur_ins[sp_id])
                    if ins not in occ_of_ins:
                        occ_of_ins[ins] = len(np.unique(p2v[st.point_ins == ins]))
                    occ[sp_id] = occ_of_ins[ins]
                st.cur_occupancy = occ
            else:
                st.cur_occupancy = np.zeros(s, np.float32)

            if add_instance_size:
                # max offset norm per instance (:545-564)
                radius = np.linalg.norm(st.cur_offset, axis=1)
                size_of_ins: Dict[int, float] = {}
                for sp_id in range(s):
                    ins = int(st.cur_ins[sp_id])
                    size_of_ins[ins] = max(size_of_ins.get(ins, 0.0), float(radius[sp_id]))
                st.cur_size = np.array(
                    [size_of_ins[int(st.cur_ins[i])] for i in range(s)], np.float32
                )
            else:
                st.cur_size = np.zeros(s, np.float32)

    # -------------------------------------------------------- propagation
    def _adjacency(self, name: str) -> np.ndarray:
        if name not in self._adj:
            scene = self.scenes[name]
            s = scene.num_superpoints
            a = np.zeros((s, s), np.float64)
            if len(scene.edges):
                a[scene.edges[:, 0], scene.edges[:, 1]] = 1.0
            a += np.eye(s)
            self._adj[name] = a
        return self._adj[name]

    def propagate(
        self,
        name: str,
        sp_semantic_value: np.ndarray,
        sp_semantic_pred: np.ndarray,
        affinity_matrix: np.ndarray,
        iterations_num: int,
    ):
        """``weak_label_propagation`` (``:664-777``): per-class powered
        transition matrix from the *base* weak graph, seeds = labeled
        superpoints, argmax over seeds becomes the pseudo label."""
        scene = self.scenes[name]
        st = self.states[name]
        centers = self._centers[name]
        s = scene.num_superpoints
        base_sem = st.base_sem
        adj = self._adjacency(name)

        scores_list, label_list = [], []
        for c in range(self.classes):
            if (base_sem == c).sum() == 0:
                continue
            gate_vec = (sp_semantic_pred == c) & (sp_semantic_value > 0.7)
            gate = np.zeros((s, s))
            gate[gate_vec] = gate_vec.astype(np.float64)  # rows & cols gated
            seed = base_sem == c
            gate[seed, seed] = 1.0

            w = affinity_matrix * adj * gate
            d = w.sum(axis=1, keepdims=True)
            d[d == 0] = 1.0
            t = w / d
            trans = t
            for _ in range(iterations_num):
                trans = trans @ t

            prob = np.zeros_like(trans)
            prob[seed] = trans[seed]
            scores_list.append(prob.max(axis=0))
            label_list.append(prob.argmax(axis=0))

        if not scores_list:
            return
        scores = np.stack(scores_list)
        labels = np.stack(label_list)
        best = scores.argmax(axis=0)
        pseudo = labels[best, np.arange(s)]
        pseudo_score = scores[best, np.arange(s)]

        self.apply_propagation(name, pseudo, pseudo_score)

    def apply_propagation(self, name: str, seed_idx: np.ndarray, score: np.ndarray):
        """Write pseudo labels from (seed index, score) per superpoint —
        shared by the host path above and the on-device kernel
        (:func:`tpu3dwsis.ops.propagation.propagate_labels_device`).
        Starts from the base graph each round (``:744``)."""
        st = self.states[name]
        centers = self._centers[name]
        new_sem = st.base_sem.copy()
        new_ins = st.base_ins.copy()
        new_off = st.base_offset.copy()
        assign = (score != 0) & (st.base_sem == IGNORE)
        for i in np.where(assign)[0]:
            seed_sp = int(seed_idx[i])
            new_sem[i] = st.base_sem[seed_sp]
            new_ins[i] = st.base_ins[seed_sp]
            ins_center = centers[seed_sp] + st.base_offset[seed_sp]
            new_off[i] = ins_center - centers[i]
        st.cur_sem, st.cur_ins, st.cur_offset = new_sem, new_ins, new_off

    def extend_to_neighbor(
        self, name: str, sp_semantic_value: np.ndarray, sp_semantic_pred: np.ndarray
    ):
        """``extend_label_to_neighbor`` (``:780-821``): copy each base label
        to unlabeled graph neighbors whose predicted class matches with
        confidence > 0.8."""
        scene = self.scenes[name]
        st = self.states[name]
        centers = self._centers[name]
        new_sem = st.base_sem.copy()
        new_ins = st.base_ins.copy()
        new_off = st.base_offset.copy()
        nbrs: Dict[int, set] = {}
        for u, v in scene.edges:
            nbrs.setdefault(int(u), set()).add(int(v))
            nbrs.setdefault(int(v), set()).add(int(u))
        for sp_id in np.where((st.base_sem != IGNORE) & (st.base_ins != IGNORE))[0]:
            for nb in nbrs.get(int(sp_id), ()):
                if (
                    sp_semantic_pred[nb] == st.base_sem[sp_id]
                    and sp_semantic_value[nb] > 0.8
                    and st.base_sem[nb] == IGNORE
                    and st.base_ins[nb] == IGNORE
                ):
                    new_sem[nb] = st.base_sem[sp_id]
                    new_ins[nb] = st.base_ins[sp_id]
                    ins_center = centers[sp_id] + st.base_offset[sp_id]
                    new_off[nb] = ins_center - centers[nb]
        st.cur_sem, st.cur_ins, st.cur_offset = new_sem, new_ins, new_off

    def propagate_current_to_neighbor(
        self, name: str, sp_semantic_pred: np.ndarray
    ):
        """``propagate_label_to_neighbor`` (``:825-871``): like
        :meth:`extend_to_neighbor` but reads/extends the *current* pseudo
        graph (no confidence threshold), so labels creep outward one ring per
        call."""
        scene = self.scenes[name]
        st = self.states[name]
        centers = self._centers[name]
        new_sem = st.cur_sem.copy()
        new_ins = st.cur_ins.copy()
        new_off = st.cur_offset.copy()
        nbrs: Dict[int, set] = {}
        for u, v in scene.edges:
            nbrs.setdefault(int(u), set()).add(int(v))
            nbrs.setdefault(int(v), set()).add(int(u))
        labeled = (st.cur_sem != IGNORE) & (st.cur_ins != IGNORE)
        for sp_id in np.where(labeled)[0]:
            for nb in nbrs.get(int(sp_id), ()):
                if (
                    sp_semantic_pred[nb] == st.cur_sem[sp_id]
                    and st.cur_sem[nb] == IGNORE
                    and st.cur_ins[nb] == IGNORE
                    and new_sem[nb] == IGNORE
                ):
                    new_sem[nb] = st.cur_sem[sp_id]
                    new_ins[nb] = st.cur_ins[sp_id]
                    ins_center = centers[sp_id] + st.cur_offset[sp_id]
                    new_off[nb] = ins_center - centers[nb]
        st.cur_sem, st.cur_ins, st.cur_offset = new_sem, new_ins, new_off

    def propagate_to_whole_scene(
        self,
        name: str,
        sp_semantic_value: np.ndarray,
        sp_semantic_pred: np.ndarray,
        pred_sp_offset: np.ndarray,
        match_radius: float = 0.9,
    ):
        """``propagate_label_to_whole_scene`` (``:873-967``): every unlabeled
        superpoint whose offset-predicted center lands within
        ``match_radius`` of a same-class prior instance center joins that
        instance; offsets are recomputed to the pseudo instance center
        (point-weighted mean over its member superpoints).

        S3DIS uses ``match_radius=1.2`` (``s3dis_dataset.py:986``).
        """
        scene = self.scenes[name]
        st = self.states[name]
        centers = self._centers[name]
        s = scene.num_superpoints

        labeled = (st.base_sem != IGNORE) & (st.base_ins != IGNORE)
        prior_idx = np.where(labeled)[0]
        if len(prior_idx) == 0:
            return
        prior_center = centers[prior_idx] + st.base_offset[prior_idx]
        prior_sem = st.base_sem[prior_idx]
        prior_ins = st.base_ins[prior_idx]

        new_sem = st.base_sem.copy()
        new_ins = st.base_ins.copy()
        new_off = st.base_offset.copy()

        members: Dict[int, list] = {}
        for sp_id in range(s):
            if labeled[sp_id]:
                continue
            pred_center = centers[sp_id] + pred_sp_offset[sp_id]
            cand = np.where(prior_sem == sp_semantic_pred[sp_id])[0]
            if len(cand) == 0:
                continue
            d = np.linalg.norm(prior_center[cand] - pred_center, axis=1)
            j = int(d.argmin())
            if d[j] > match_radius:
                continue
            members.setdefault(int(cand[j]), []).append(sp_id)

        sp_count = np.bincount(scene.superpoint, minlength=s).astype(np.float64)
        sp_sum = np.zeros((s, 3))
        for d_ in range(3):
            sp_sum[:, d_] = np.bincount(
                scene.superpoint, weights=scene.xyz[:, d_], minlength=s
            )
        for prior_i, sp_list in members.items():
            pts = sp_count[sp_list].sum()
            pseudo_center = sp_sum[sp_list].sum(0) / pts
            for sp_id in sp_list:
                new_sem[sp_id] = prior_sem[prior_i]
                new_ins[sp_id] = prior_ins[prior_i]
                new_off[sp_id] = pseudo_center - centers[sp_id]
        st.cur_sem, st.cur_ins, st.cur_offset = new_sem, new_ins, new_off

    # ------------------------------------------------------- serialization
    def state_to_arrays(self) -> Dict[str, Dict[str, np.ndarray]]:
        return {
            name: dataclasses.asdict(st) for name, st in self.states.items()
        }

    def state_from_arrays(self, data: Dict[str, Dict[str, np.ndarray]]):
        self.states = {name: SceneWeakState(**d) for name, d in data.items()}

    # -------------------------------------------------- accuracy reporting
    def label_stats(self) -> Dict[str, float]:
        """Propagation coverage/accuracy vs GT (``:599-661``)."""
        tot = lab = sem_n = sem_ok = ins_n = ins_ok = 0
        for name, scene in self.scenes.items():
            st = self.states[name]
            tot += scene.num_points
            lab += int((scene.sem != IGNORE).sum())
            wsem = st.point_sem
            sem_n += int((wsem != IGNORE).sum())
            sem_ok += int(((wsem == scene.sem) & (wsem != IGNORE)).sum())
            m = (st.point_ins != IGNORE) & (wsem != 0) & (wsem != 1)
            ins_n += int(m.sum())
            ins_ok += int(((st.point_ins == scene.ins) & m).sum())
        return {
            "sem_coverage": sem_n / max(tot, 1),
            "sem_accuracy": sem_ok / max(sem_n, 1),
            "ins_coverage": ins_n / max(tot, 1),
            "ins_accuracy": ins_ok / max(ins_n, 1),
        }
