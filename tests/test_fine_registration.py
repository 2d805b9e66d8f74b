import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from gaussreg_tpu.gs.cameras import (
    find_cameras_json,
    load_cameras_json,
    save_cameras_json,
)
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


def test_cameras_json_roundtrip_and_render(tmp_path):
    """Real-pose path (3DGS cameras.json): parse -> Camera -> render must
    match rendering from the original camera exactly."""
    from gaussreg_tpu.gs.rasterizer.render import render

    scene = _device_scene()
    cams = default_cameras(np.asarray(scene.means), num_views=2, width=96, height=64)

    # 3DGS layout: <model>/point_cloud/iteration_N/point_cloud.ply +
    # <model>/cameras.json — find_cameras_json must walk up to it
    model_dir = tmp_path / "output"
    ply_dir = model_dir / "point_cloud" / "iteration_10000"
    ply_dir.mkdir(parents=True)
    ply_path = ply_dir / "point_cloud.ply"
    ply_path.write_bytes(b"")
    path = model_dir / "cameras.json"
    save_cameras_json(str(path), cams)
    assert find_cameras_json(str(ply_path)) == str(path)

    loaded = load_cameras_json(str(path))
    assert len(loaded) == 2
    for orig, back in zip(cams, loaded):
        np.testing.assert_allclose(
            np.asarray(back.w2c), np.asarray(orig.w2c), atol=1e-5
        )
        assert (back.fx, back.fy, back.width, back.height) == pytest.approx(
            (orig.fx, orig.fy, orig.width, orig.height)
        )
        out_a = render(
            scene.means, scene.scales, scene.quats, scene.opacities,
            scene.sh_coeffs, orig, valid=scene.valid, use_pallas=False,
        )
        out_b = render(
            scene.means, scene.scales, scene.quats, scene.opacities,
            scene.sh_coeffs, back, valid=scene.valid, use_pallas=False,
        )
        np.testing.assert_allclose(
            np.asarray(out_b.rgb), np.asarray(out_a.rgb), atol=1e-4
        )
        assert float(jnp.mean(1.0 - out_a.transmittance)) > 0.01  # non-empty

    # max_cameras subsampling + max_size rescale
    sub = load_cameras_json(str(path), max_cameras=1, max_size=48)
    assert len(sub) == 1 and max(sub[0].width, sub[0].height) <= 48
    assert sub[0].fx == pytest.approx(cams[0].fx * 48 / 96)
