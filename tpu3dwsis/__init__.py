"""tpu3dwsis — a TPU-native (JAX/XLA/Pallas) framework for weakly supervised
3D point-cloud instance segmentation.

Re-designed from scratch with the capabilities of fpthink/3D-WSIS (ACCV 2022):
given indoor scans with one annotated superpoint per instance, it trains a
submanifold sparse-conv 3D U-Net plus an edge-conditioned superpoint graph
network, iteratively propagates weak labels over the superpoint graph via a
learned inter-superpoint affinity, and produces instance masks by graph
clustering.

Unlike the CUDA reference (spconv, pointgroup_ops, NVRTC ECC kernels), every
hot op here is built TPU-first: sort/searchsorted-based rulebooks feeding
gather-GEMM-scatter sparse convolutions on the MXU, segment-op voxelization
and superpoint pooling, and padded fixed-shape superpoint graphs so the whole
forward/backward jits with static shapes.
"""

__version__ = "0.1.0"
