"""TPU-native (JAX/XLA/Pallas) rebuild of ethanhe42/epipolar-transformers.

Multi-view 3D human/hand pose estimation: epipolar-transformer feature fusion,
heatmap keypoint backbones, soft-argmax decoding, DLT/RANSAC triangulation,
2D->3D lifting — all jit-compiled, data-parallel over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from .config import Config, load_config  # noqa: F401
