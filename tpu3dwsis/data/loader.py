"""Scene dataset + batch iteration.

The reference uses torch DataLoader worker processes (10 workers,
``config/ScanNet_v2_3D_WSIS.yaml:23``) around ``__getitem__``/``collate_fn``.
Here collation is light host numpy (the heavy voxelize/rulebook work moved
on-device into the jitted step), so a simple synchronous iterator with an
optional one-batch background prefetch thread suffices.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from ..core.containers import BatchStatics
from .collate import SceneLabels, collate
from .scene import Scene
from .weak_labels import WeakLabelStore

__all__ = ["SceneDataset", "batch_iterator"]


class SceneDataset:
    """A split of scenes plus the label source (GT or weak-label store)."""

    def __init__(
        self,
        scenes: Sequence[Scene],
        statics: BatchStatics,
        weak_store: Optional[WeakLabelStore] = None,
        scale: float = 50.0,
        max_npoint: int = 250000,
        full_scale_hi: int = 512,
        crop_mode: str = "shift",
        subsample: bool = False,
    ):
        self.scenes = list(scenes)
        self.statics = statics
        self.weak_store = weak_store
        self.scale = scale
        self.max_npoint = max_npoint
        self.full_scale_hi = full_scale_hi
        self.crop_mode = crop_mode
        self.subsample = subsample

    def labels_for(self, scene: Scene) -> SceneLabels:
        if self.weak_store is not None:
            st = self.weak_store.states[scene.name]
            return SceneLabels(
                point_sem=st.point_sem,
                point_ins=st.point_ins,
                sp_sem=st.cur_sem,
                sp_ins=st.cur_ins,
                sp_offset=st.cur_offset,
                sp_occupancy=st.cur_occupancy,
                sp_size=st.cur_size,
            )
        return SceneLabels(
            point_sem=scene.sem,
            point_ins=scene.ins,
            sp_sem=scene.sp_sem_gt,
            sp_ins=scene.sp_ins_gt,
            sp_offset=scene.sp_offset_gt,
        )

    def collate_batch(
        self, indices: Sequence[int], rng: np.random.Generator, training: bool
    ) -> Dict[str, np.ndarray]:
        scenes = [self.scenes[i] for i in indices]
        labels = [self.labels_for(s) for s in scenes]
        return collate(
            scenes,
            labels,
            self.statics,
            rng,
            training=training,
            scale=self.scale,
            max_npoint=self.max_npoint,
            full_scale_hi=self.full_scale_hi,
            crop_mode=self.crop_mode,
            subsample=self.subsample,
        )


def batch_iterator(
    dataset: SceneDataset,
    batch_size: int,
    rng: np.random.Generator,
    training: bool = True,
    shuffle: bool = True,
    drop_last: bool = True,
    prefetch: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield collated numpy batches, optionally prefetching one batch ahead
    on a thread (host has little CPU; the device step dominates anyway)."""
    n = len(dataset.scenes)
    order = rng.permutation(n) if shuffle else np.arange(n)
    spans = [
        order[i : i + batch_size]
        for i in range(0, n, batch_size)
        if not (drop_last and i + batch_size > n)
    ]
    if not spans:
        return

    if not prefetch:
        for span in spans:
            yield dataset.collate_batch(span, rng, training)
        return

    q: "queue.Queue" = queue.Queue(maxsize=2)

    def worker():
        try:
            for span in spans:
                q.put(("ok", dataset.collate_batch(span, rng, training)))
        except Exception as e:  # surface worker errors in the consumer
            q.put(("err", e))
        q.put(("done", None))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        kind, item = q.get()
        if kind == "done":
            break
        if kind == "err":
            raise item
        yield item
