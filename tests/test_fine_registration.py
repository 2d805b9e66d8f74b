import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from gaussreg_tpu.gs.fine_registration import (
    GaussiansDevice,
    default_cameras,
    fine_register,
    transform_gaussians_device,
)
from gaussreg_tpu.models.metrics import isotropic_transform_error


def _device_scene(n=60, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    return GaussiansDevice(
        means=jnp.asarray(means),
        scales=jnp.asarray(
            np.exp(rng.normal(-1.8, 0.3, size=(n, 3))).astype(np.float32)
        ),
        quats=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        opacities=jnp.asarray(rng.uniform(0.6, 0.95, size=n).astype(np.float32)),
        sh_coeffs=jnp.asarray(
            np.concatenate(
                [
                    rng.uniform(-0.8, 0.8, size=(n, 3, 1)),
                    rng.normal(scale=0.03, size=(n, 3, 15)),
                ],
                axis=2,
            ).astype(np.float32)
        ),
        valid=jnp.ones(n, bool),
    )


def test_fine_registration_refines_pose():
    """A small pose/scale perturbation must be (mostly) recovered by
    photometric refinement."""
    src = _device_scene()
    gt = np.eye(4, dtype=np.float32)
    r = Rotation.from_rotvec([0.0, 0.06, 0.03]).as_matrix().astype(np.float32)
    gt[:3, :3] = 1.05 * r
    gt[:3, 3] = [0.05, -0.03, 0.02]
    ref = transform_gaussians_device(src, jnp.asarray(gt))

    cams = default_cameras(np.asarray(src.means), num_views=3, width=96, height=64)
    init = jnp.eye(4)  # coarse estimate = identity (off by the perturbation)
    rre0, rte0, rse0 = isotropic_transform_error(jnp.asarray(gt), init)

    result = fine_register(
        ref, src, init, cams, num_steps=150, lr=5e-3, use_pallas=False
    )
    rre, rte, rse = isotropic_transform_error(jnp.asarray(gt), result.transform)

    assert float(result.losses[-1]) < float(result.losses[0])
    assert float(rre) < float(rre0)
    assert float(rse) < float(rse0)
    assert float(rre) < 2.0  # degrees
    assert float(rse) < 0.02
