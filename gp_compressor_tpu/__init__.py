"""gp_compressor_tpu — a TPU-native probabilistic point-cloud inference engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
nilsbore/gp_compressor (see /root/reference): sparse Gaussian-process patch
regression over voxel-partitioned colored point clouds (RBF kernels,
Gaussian / probit noise) powering

  * compression / decompression      (reference: src/gp_compressor.cpp)
  * K-SVD + OMP dictionary coding    (reference: src/ksvd_decomposition.cpp)
  * GP-gradient scan registration    (reference: src/gp_registration.cpp)
  * online incremental mapping       (reference: src/gp_mapping.cpp)

plus a Bayesian layer the reference lacks: HMC/NUTS and VI over kernel
hyperparameters and SMC over scan poses, sharded across a TPU mesh.

Design: every patch GP is a capacity-padded, mask-active state record
(`models.sparse_gp.SOGPState`) updated by pure functions under `lax.scan`,
`vmap`-ed over thousands of patches and sharded over `jax.sharding.Mesh`
axes. The octree is replaced by static voxel binning + 27-neighborhood
gathers; all hot paths are batched matmuls that map onto the MXU, with
Pallas kernels for the cases XLA cannot fuse (whole-training-loop-in-VMEM
SOGP updates).
"""

__version__ = "0.1.0"

from gp_compressor_tpu import config  # noqa: F401
