"""Weighted Procrustes / Umeyama similarity estimation — fully on device.

The reference computes weighted rigid Procrustes with a host round-trip SVD
(reference: geotransformer/modules/registration/procrustes.py:6-82, CPU SVD at
:59) and estimates the final similarity (with scale) via Open3D RANSAC's
Umeyama (reference: geotransformer/utils/open3d.py:169-198,
TransformationEstimationPointToPoint(with_scaling=True)). Here both are
batched jnp.linalg.svd on 3x3 matrices — no host transfer.
"""

from __future__ import annotations

import jax.numpy as jnp

from gaussreg_tpu.ops.transforms import transform_from_rotation_translation


def _weighted_stats(src, ref, weights, weight_thresh, eps):
    w = jnp.where(weights < weight_thresh, 0.0, weights)
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + eps)
    w = w[..., None]  # (..., N, 1)
    src_centroid = jnp.sum(src * w, axis=-2, keepdims=True)
    ref_centroid = jnp.sum(ref * w, axis=-2, keepdims=True)
    src_c = src - src_centroid
    ref_c = ref - ref_centroid
    # H = src_c^T W ref_c  (reference procrustes.py:58)
    h = jnp.einsum("...ni,...nj->...ij", src_c, w[..., 0:1] * ref_c)
    return w, src_centroid, ref_centroid, src_c, ref_c, h


def _svd_rotation(h):
    """R maximizing trace(R H) with det(R)=+1, from H = U S V^T.

    Kept as the oracle twin of `_horn_rotation` (tests compare them); not
    used on the hot path — jnp.linalg.svd lowers to qdwh (EighTpu +
    Cholesky custom-calls + serial while loops) costing ~90 ms at
    (10000, 3, 3) on a v5e (PERF.md round 4 trace)."""
    u, s, vt = jnp.linalg.svd(h)
    v = jnp.swapaxes(vt, -1, -2)
    ut = jnp.swapaxes(u, -1, -2)
    det = jnp.linalg.det(v @ ut)
    d = jnp.ones_like(s).at[..., -1].set(jnp.sign(det))
    r = (v * d[..., None, :]) @ ut
    return r, s, d


def _horn_rotation(h):
    """R maximizing trace(R H) with det(R)=+1 — Horn's quaternion method
    (closed-form absolute orientation, Horn 1987): the optimal proper
    rotation is R(q) for the dominant eigenvector q of the symmetric 4x4
    Davenport matrix N(H). Identical to SVD-with-det-fix Kabsch (both
    solve the same constrained maximization), but needs no XLA custom
    call: the dominant eigenvector comes from normalized matrix squaring
    (8 batched 4x4 squarings = N_shifted^256), all elementwise/matmul.

    ~2 ms at (10000, 3, 3) vs ~90 ms for the qdwh SVD path (PERF.md r4)."""
    sxx, sxy, sxz = h[..., 0, 0], h[..., 0, 1], h[..., 0, 2]
    syx, syy, syz = h[..., 1, 0], h[..., 1, 1], h[..., 1, 2]
    szx, szy, szz = h[..., 2, 0], h[..., 2, 1], h[..., 2, 2]
    n4 = jnp.stack(
        [
            jnp.stack([sxx + syy + szz, syz - szy, szx - sxz, sxy - syx], -1),
            jnp.stack([syz - szy, sxx - syy - szz, sxy + syx, szx + sxz], -1),
            jnp.stack([szx - sxz, sxy + syx, syy - sxx - szz, syz + szy], -1),
            jnp.stack([sxy - syx, szx + sxz, syz + szy, szz - sxx - syy], -1),
        ],
        -2,
    )  # (..., 4, 4) symmetric; eigenvalues bounded by sum of singulars of H
    fro = jnp.sqrt(jnp.sum(h * h, axis=(-2, -1), keepdims=True))
    # shift makes K PSD (|lambda(N)| <= sigma1+sigma2+sigma3 <= sqrt(3)|H|_F)
    k = n4 + (jnp.sqrt(3.0) * fro + 1e-12) * jnp.eye(4, dtype=h.dtype)
    for _ in range(8):
        k = jnp.einsum("...ij,...jk->...ik", k, k)
        k = k / jnp.sqrt(jnp.sum(k * k, axis=(-2, -1), keepdims=True) + 1e-30)
    # K^256 ~ rank-1 q q^T: any column with nonzero weight is ~q; the
    # largest column is safe (the dominant |q_i| >= 1/2)
    idx = jnp.argmax(jnp.sum(k * k, axis=-2), axis=-1)
    q = jnp.take_along_axis(k, idx[..., None, None], axis=-1)[..., 0]
    q = q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-30)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            jnp.stack(
                [w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)], -1
            ),
            jnp.stack(
                [2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)], -1
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z], -1
            ),
        ],
        -2,
    )
    return r


def weighted_procrustes(
    src_points: jnp.ndarray,
    ref_points: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    weight_thresh: float = 0.0,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Weighted rigid Procrustes: returns (..., 4, 4) transforms mapping
    src -> ref. Batched over leading dims; degenerate (all-zero-weight)
    batches return a transform close to identity+centroid shift rather than
    NaN.

    reference semantics: geotransformer/modules/registration/procrustes.py:6-82.
    """
    if weights is None:
        weights = jnp.ones(src_points.shape[:-1], src_points.dtype)
    w, src_centroid, ref_centroid, _, _, h = _weighted_stats(
        src_points, ref_points, weights, weight_thresh, eps
    )
    # guard against exactly-zero H (degenerate patch) which breaks grads
    h = h + 1e-9 * jnp.eye(3, dtype=h.dtype)
    r = _horn_rotation(h)
    t = ref_centroid[..., 0, :] - jnp.einsum("...ij,...j->...i", r, src_centroid[..., 0, :])
    return transform_from_rotation_translation(r, t)


def umeyama_similarity(
    src_points: jnp.ndarray,
    ref_points: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    with_scale: bool = True,
    weight_thresh: float = 0.0,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Weighted Umeyama similarity estimation: (..., 4, 4) transform whose
    3x3 block is s*R, matching Open3D's with-scaling point-to-point estimator
    used by the reference's final RANSAC (utils/open3d.py:193)."""
    if weights is None:
        weights = jnp.ones(src_points.shape[:-1], src_points.dtype)
    w, src_centroid, ref_centroid, src_c, _, h = _weighted_stats(
        src_points, ref_points, weights, weight_thresh, eps
    )
    h = h + 1e-9 * jnp.eye(3, dtype=h.dtype)
    r = _horn_rotation(h)
    if with_scale:
        var_src = jnp.sum(w[..., 0] * jnp.sum(src_c * src_c, axis=-1), axis=-1)
        # sum of det-corrected singulars = max trace(R H) — no SVD needed
        scale = jnp.einsum("...ij,...ji->...", r, h) / jnp.maximum(var_src, eps)
    else:
        scale = jnp.ones(h.shape[:-2], h.dtype)
    sr = r * scale[..., None, None]
    t = ref_centroid[..., 0, :] - jnp.einsum(
        "...ij,...j->...i", sr, src_centroid[..., 0, :]
    )
    return transform_from_rotation_translation(sr, t)
