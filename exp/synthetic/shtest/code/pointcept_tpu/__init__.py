"""pointcept_tpu: a TPU-native (JAX/XLA/Pallas) point-cloud perception framework.

A from-scratch rebuild of the capabilities of Pointcept/Pointcept with a
TPU-first architecture: static-shape padded point batches, curve-serialized
patch attention, gather-GEMM-scatter sparse convolution, and single-controller
SPMD over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"
