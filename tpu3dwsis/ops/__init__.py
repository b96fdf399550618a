"""TPU-native numeric ops: segment reductions, voxelization, sparse-conv
rulebooks and kernels, padded graph ops."""

from . import hashgrid, rulebook, segment, sparse_conv, voxelize  # noqa: F401
