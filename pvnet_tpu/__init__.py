"""pvnet_tpu — a TPU-native 6DoF object pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
PVNet codebase (zju3dv/pvnet, CVPR 2019): a fully-convolutional ResNet-8s
backbone emitting per-pixel segmentation + keypoint vector fields, a batched
fixed-shape RANSAC voting layer (Pallas TPU kernels replacing the reference's
CUDA kernels, ref lib/ransac_voting_gpu_layer/src/ransac_voting_kernel.cu),
and an uncertainty-weighted DLT/EPnP + Levenberg-Marquardt PnP solver in pure
JAX (replacing the reference's Ceres solver, ref
lib/utils/extend_utils/src/uncertainty_pnp.cpp), so the full image->pose path
compiles into a single jitted program and scales over a device mesh with
jax.sharding.

Subpackages
-----------
- ``pvnet_tpu.models``   : Flax FCN models (ResNet18/34/50-8s).
- ``pvnet_tpu.ops``      : voting, PnP, geometry, NN-query kernels.
- ``pvnet_tpu.data``     : LINEMOD datasets, augmentation, input pipeline.
- ``pvnet_tpu.train``    : losses, trainer, checkpointing, recording.
- ``pvnet_tpu.eval``     : ADD(-S) / 2D-projection / 5cm5deg evaluation.
- ``pvnet_tpu.parallel`` : device mesh + sharding helpers.
- ``pvnet_tpu.native``   : C++ host-side utilities (FPS, NN, rasterizer).
"""

__version__ = "0.1.0"
