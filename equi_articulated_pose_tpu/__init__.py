"""equi_articulated_pose_tpu — TPU-native (JAX/XLA/Pallas) framework for
self-supervised category-level articulated-object pose estimation with
part-level SE(3) equivariance.

Brand-new implementation of the capabilities of Meowuu7/equi-articulated-pose
(ICLR 2023), re-designed for TPU: MXU-friendly einsum convolutions over the
60-anchor icosahedral rotation orbit, masked-vmap slot processing, Pallas
chamfer kernels, and shard_map data parallelism over a device mesh.
"""

__version__ = "0.1.0"
