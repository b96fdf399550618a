"""Training: optimizer, jitted steps, curriculum driver, checkpointing."""

from .checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint  # noqa: F401
from .curriculum import CurriculumConfig, StageConfig, Trainer  # noqa: F401
from .optim import make_optimizer, poly_lr_schedule  # noqa: F401
from .state import TrainState, init_train_state  # noqa: F401
from .step import make_forward_fn, make_train_step  # noqa: F401
