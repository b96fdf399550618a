"""Neural network modules: sparse U-Net, ECC-GRU graph net, heads, losses."""

from .losses import LossConfig, LossFlags, multi_task_loss  # noqa: F401
from .network import NetConfig, Preprocessed, WSISNet, preprocess  # noqa: F401
from .norm import MaskedBatchNorm  # noqa: F401
from .unet import SparseUNet  # noqa: F401
