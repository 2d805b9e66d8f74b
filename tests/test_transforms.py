import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from gaussreg_tpu.ops import transforms as T


def random_rotation_np(seed):
    return Rotation.random(random_state=seed).as_matrix().astype(np.float32)


def test_apply_transform_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    r = random_rotation_np(1)
    t = rng.normal(size=3).astype(np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = r
    m[:3, 3] = t
    out = T.apply_transform(jnp.asarray(pts), jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(out), pts @ r.T + t, atol=1e-5)


def test_apply_transform_batched():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(4, 10, 3)).astype(np.float32)
    ms = np.stack([np.eye(4, dtype=np.float32) for _ in range(4)])
    for i in range(4):
        ms[i, :3, :3] = random_rotation_np(i)
        ms[i, :3, 3] = rng.normal(size=3)
    out = np.asarray(T.apply_transform(jnp.asarray(pts), jnp.asarray(ms)))
    for i in range(4):
        np.testing.assert_allclose(
            out[i], pts[i] @ ms[i, :3, :3].T + ms[i, :3, 3], atol=1e-5
        )


def test_similarity_decomposition_roundtrip():
    r = random_rotation_np(3)
    s = 2.37
    t = np.array([0.5, -1.0, 2.0], np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = s * r
    m[:3, 3] = t
    rot, trans, scale = T.rotation_translation_scale_from_transform(jnp.asarray(m))
    np.testing.assert_allclose(float(scale), s, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rot), r, atol=1e-5)
    np.testing.assert_allclose(np.asarray(trans), t / s, atol=1e-5)


def test_inverse_rigid_transform():
    r = random_rotation_np(4)
    t = np.array([1.0, 2.0, 3.0], np.float32)
    m = T.transform_from_rotation_translation(jnp.asarray(r), jnp.asarray(t))
    inv = T.inverse_rigid_transform(m)
    np.testing.assert_allclose(np.asarray(m @ inv), np.eye(4), atol=1e-5)


def test_rodrigues_vs_scipy():
    axis = np.array([0.3, -0.5, 0.81], np.float32)
    angle = 1.234
    got = np.asarray(T.rodrigues_rotation(jnp.asarray(axis), jnp.asarray(angle)))
    axis_n = axis / np.linalg.norm(axis)
    want = Rotation.from_rotvec(axis_n * angle).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_quaternion_matrix_roundtrip(seed):
    r = random_rotation_np(seed)
    q = T.matrix_to_quaternion(jnp.asarray(r))
    r2 = T.quaternion_to_matrix(q)
    np.testing.assert_allclose(np.asarray(r2), r, atol=1e-5)


def test_quaternion_to_matrix_vs_scipy():
    rng = np.random.default_rng(7)
    q = rng.normal(size=(16, 4)).astype(np.float32)
    got = np.asarray(T.quaternion_to_matrix(jnp.asarray(q)))
    # scipy uses xyzw ordering
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    want = Rotation.from_quat(qn[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quaternion_multiply_matches_matrix_product():
    ra, rb = random_rotation_np(8), random_rotation_np(9)
    qa = T.matrix_to_quaternion(jnp.asarray(ra))
    qb = T.matrix_to_quaternion(jnp.asarray(rb))
    qab = T.quaternion_multiply(qa, qb)
    np.testing.assert_allclose(
        np.asarray(T.quaternion_to_matrix(qab)), ra @ rb, atol=1e-5
    )


def test_random_rotation_is_orthonormal():
    r = np.asarray(T.random_rotation(jax.random.PRNGKey(0)))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)
