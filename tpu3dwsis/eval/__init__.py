"""Evaluation: ScanNet AP protocol, semantic IoU, S3DIS coverage metrics."""

from .instance_ap import InstanceAPEvaluator, encode_gt_instances  # noqa: F401
from .s3dis_cov import S3DISCoverageEvaluator  # noqa: F401
from .semantic import SemanticEvaluator  # noqa: F401
