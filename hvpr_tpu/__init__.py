"""hvpr_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the HVPR 3D detection stack.

Same capabilities as cvlab-yonsei/HVPR (CVPR 2021) / OpenPCDet v0.3, re-designed
for TPU: fixed-shape batched tensors, pure-functional flax models, device-side
voxelization and rotated NMS, and data-parallel training over a jax.sharding.Mesh.
"""

__version__ = '0.1.0'
