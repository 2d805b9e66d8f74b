"""SE(3)+scale transform algebra, quaternions, rotation parameterizations.

TPU-native equivalents of the reference transform helpers
(reference: geotransformer/modules/ops/transformation.py:7-267 and
gs_fusion.py:70-170). All functions are pure jnp, batched over leading dims,
and jit/vmap/grad-safe.

A "transform" is a (..., 4, 4) matrix whose rotation block may carry an
isotropic scale s (i.e. the top-left 3x3 block is s*R with R orthonormal),
matching the reference's similarity-transform convention
(reference: geotransformer/modules/ops/transformation.py:110-123).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_transform(points: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Apply a (4, 4) (or batched (..., 4, 4)) transform to (..., N, 3) points.

    reference semantics: geotransformer/modules/ops/transformation.py:7-60
    (points @ R^T + t), supporting an unbatched transform applied to any
    leading point batch dims, or a batch of transforms matching the points'
    leading dims.
    """
    rotation = transform[..., :3, :3]
    translation = transform[..., :3, 3]
    if transform.ndim == 2:
        return points @ rotation.T + translation
    # batched: points (..., N, 3), transform (..., 4, 4)
    return jnp.einsum("...ij,...nj->...ni", rotation, points) + translation[..., None, :]


def apply_rotation(points: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    """reference: geotransformer/modules/ops/transformation.py:63-107."""
    if rotation.ndim == 2:
        return points @ rotation.T
    return jnp.einsum("...ij,...nj->...ni", rotation, points)


def transform_from_rotation_translation(
    rotation: jnp.ndarray, translation: jnp.ndarray
) -> jnp.ndarray:
    """Compose (..., 4, 4) from (..., 3, 3) and (..., 3).

    reference: geotransformer/modules/ops/transformation.py:139-157.
    """
    batch_shape = rotation.shape[:-2]
    top = jnp.concatenate([rotation, translation[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rotation.dtype), batch_shape + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rotation_translation_scale_from_transform(transform: jnp.ndarray):
    """Decompose a similarity transform into (R, t, s) with s scalar (..., 1, 1).

    The reference estimates s = sqrt((A A^T)[0, 0]) where A is the 3x3 block
    (reference: geotransformer/modules/ops/transformation.py:110-123,
    gs_fusion.py:239). For an exact similarity all rows of A have norm s, so
    this equals the isotropic scale.
    """
    a = transform[..., :3, :3]
    scale = jnp.sqrt(jnp.einsum("...ij,...ij->...", a[..., 0:1, :], a[..., 0:1, :]))
    scale = scale[..., None, None]  # (..., 1, 1)
    rotation = a / scale
    translation = transform[..., :3, 3] / scale[..., 0]
    return rotation, translation, scale[..., 0, 0]


def inverse_rigid_transform(transform: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid (no scale) transform.

    reference: geotransformer/modules/ops/transformation.py:160-173.
    """
    rotation = transform[..., :3, :3]
    translation = transform[..., :3, 3]
    inv_rotation = jnp.swapaxes(rotation, -1, -2)
    inv_translation = -jnp.einsum("...ij,...j->...i", inv_rotation, translation)
    return transform_from_rotation_translation(inv_rotation, inv_translation)


def skew_symmetric(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix.

    reference: geotransformer/modules/ops/transformation.py:176-198.
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rodrigues_rotation(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle -> rotation matrix via the Rodrigues formula.

    reference: geotransformer/modules/ops/transformation.py:201-267.
    axis: (..., 3) (need not be normalized), angle: (...) radians.
    """
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12)
    k = skew_symmetric(axis)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), k.shape)
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    return eye + s * k + (1.0 - c) * (k @ k)


def exp_so3(omega: jnp.ndarray) -> jnp.ndarray:
    """so(3) exponential map with gradient-safe behavior at omega = 0
    (Taylor fallback for the sinc-style coefficients)."""
    a2 = jnp.sum(omega * omega, axis=-1)
    small = a2 < 1e-8
    # evaluate the exact branch at a safe point so its (unselected) gradient
    # cannot produce inf * 0 = NaN through the where
    a2_safe = jnp.where(small, 1.0, a2)
    a = jnp.sqrt(a2_safe)
    c1 = jnp.where(small, 1.0 - a2 / 6.0, jnp.sin(a) / a)  # sin(a)/a
    c2 = jnp.where(small, 0.5 - a2 / 24.0, (1.0 - jnp.cos(a)) / a2_safe)
    k = skew_symmetric(omega)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), k.shape)
    return eye + c1[..., None, None] * k + c2[..., None, None] * (k @ k)


def random_rotation(key: jax.Array, rotation_factor: float = 1.0) -> jnp.ndarray:
    """Random rotation: uniform axis, angle uniform in [0, 2*pi*factor).

    reference: geotransformer/utils/pointcloud.py:126-139
    (random_sample_rotation).
    """
    k1, k2 = jax.random.split(key)
    axis = jax.random.normal(k1, (3,))
    angle = jax.random.uniform(k2, ()) * 2.0 * jnp.pi * rotation_factor
    return rodrigues_rotation(axis, angle)


# ---------------------------------------------------------------------------
# Quaternions (scalar-first convention, matching 3DGS .ply files and the
# reference's PyTorch3D-derived helpers at gs_fusion.py:70-170).
# ---------------------------------------------------------------------------


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3). Handles unnormalized input.

    reference semantics: gs_fusion.py:70-99.
    """
    r, i, j, k = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    rows = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return rows.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz quaternion, picking the best-conditioned
    of the four candidate solutions.

    reference semantics: gs_fusion.py:111-170 (PyTorch3D-derived).
    """
    batch = m.shape[:-2]
    f = m.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [f[..., i] for i in range(9)]

    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    # zero subgradient at 0 (reference gs_fusion.py:101-109): sqrt(max(x, e))
    # saturates the gradient instead of producing inf at x == 0
    q_abs = jnp.where(
        q_abs_sq > 1e-10, jnp.sqrt(jnp.maximum(q_abs_sq, 1e-10)), 0.0
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4 components)

    denom = 2.0 * jnp.maximum(q_abs, 0.1)[..., None]
    candidates = quat_by_rijk / denom
    best = jnp.argmax(q_abs, axis=-1)
    return jnp.take_along_axis(
        candidates, best[..., None, None].repeat(4, axis=-1), axis=-2
    )[..., 0, :]


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions (..., 4) x (..., 4)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )
