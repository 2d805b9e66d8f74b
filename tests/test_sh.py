import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from gaussreg_tpu.gs import sh


def test_rgb_sh_roundtrip():
    rgb = np.array([0.1, 0.5, 0.9])
    np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, atol=1e-7)


def test_eval_sh_deg0_is_dc():
    coeffs = np.zeros((4, 3, 16), np.float32)
    coeffs[:, :, 0] = 2.0
    dirs = np.array([[0.0, 0.0, 1.0]], np.float32)
    out = sh.eval_sh(3, jnp.asarray(coeffs), jnp.asarray(dirs))
    np.testing.assert_allclose(np.asarray(out), 2.0 * sh.C0, atol=1e-6)


def _sh_orthonormality_check(band):
    # numerically integrate band products over the sphere: basis should be
    # orthonormal under the standard real-SH normalization
    rng = np.random.default_rng(0)
    d = rng.normal(size=(200000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    y = np.asarray(sh._band_basis(band, jnp.asarray(d)))
    gram = 4 * np.pi * y.T @ y / d.shape[0]
    np.testing.assert_allclose(gram, np.eye(y.shape[1]), atol=0.05)


def test_band_basis_orthonormal():
    for band in (1, 2, 3):
        _sh_orthonormality_check(band)


def test_sh_rotation_consistency():
    """Rotated coefficients evaluated at rotated dirs == original at original
    dirs (the invariant behind gs_fusion.py:53-68)."""
    rng = np.random.default_rng(1)
    n = 32
    f_rest = rng.normal(size=(n, 3, 15)).astype(np.float64)
    f_dc = rng.normal(size=(n, 3, 1)).astype(np.float64)
    r = Rotation.random(random_state=5).as_matrix()

    f_rest_rot = np.asarray(sh.rotate_sh_rest(jnp.asarray(f_rest), jnp.asarray(r)))

    dirs = rng.normal(size=(50, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    coeffs = np.concatenate([f_dc, f_rest], axis=2)
    coeffs_rot = np.concatenate([f_dc, f_rest_rot], axis=2)

    for d in dirs[:10]:
        orig = np.asarray(sh.eval_sh(3, jnp.asarray(coeffs), jnp.asarray(d)))
        rot = np.asarray(sh.eval_sh(3, jnp.asarray(coeffs_rot), jnp.asarray(r @ d)))
        np.testing.assert_allclose(rot, orig, atol=1e-5)  # f32 compute
