"""gaussreg_tpu — a TPU-native 3D Gaussian Splatting registration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
GAP-LAB-CUHK-SZ/GaussReg (ECCV 2024): registration of two 3D Gaussian
Splatting scene models with unknown relative scale, plus fusion of the two
models into one coordinate frame, and a tile-based Gaussian rasterizer for
render-and-compare fine registration.

Everything on the compute path is jittable, statically shaped, and
mask-native; parallelism is expressed with `jax.sharding` over a device mesh.
"""

__version__ = "0.1.0"

from gaussreg_tpu import config  # noqa: F401
