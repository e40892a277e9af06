"""mdqe_cvpr2023_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video instance segmentation
framework with the capabilities of MDQE (CVPR 2023).

Reference (behavioral spec only): MinghanLi/MDQE_CVPR2023, mounted at /root/reference.
This is a from-scratch redesign for TPU: functional pytree models, fixed-shape jitted
window/clip inference, a Pallas multi-scale deformable-attention kernel with an XLA
gather fallback, and data-parallel training via jax.sharding.Mesh + shard_map.
"""

__version__ = "0.1.0"
