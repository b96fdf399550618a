"""Data pipeline: scenes, augmentation/collate, weak-label state machine,
synthetic fixtures, dataset drivers."""

from .collate import SceneLabels, collate, to_scene_batch  # noqa: F401
from .scene import Scene, load_scene, save_scene  # noqa: F401
from .weak_labels import SceneWeakState, WeakLabelStore  # noqa: F401
