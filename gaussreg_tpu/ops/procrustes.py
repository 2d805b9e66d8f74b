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
    """R maximizing trace(R H) with det(R)=+1, from H = U S V^T."""
    u, s, vt = jnp.linalg.svd(h)
    v = jnp.swapaxes(vt, -1, -2)
    ut = jnp.swapaxes(u, -1, -2)
    det = jnp.linalg.det(v @ ut)
    d = jnp.ones_like(s).at[..., -1].set(jnp.sign(det))
    r = (v * d[..., None, :]) @ ut
    return r, s, d


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
    # guard against exactly-zero H (degenerate patch) which breaks SVD grads
    h = h + 1e-9 * jnp.eye(3, dtype=h.dtype)
    r, _, _ = _svd_rotation(h)
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
    r, s, d = _svd_rotation(h)
    if with_scale:
        var_src = jnp.sum(w[..., 0] * jnp.sum(src_c * src_c, axis=-1), axis=-1)
        scale = jnp.sum(s * d, axis=-1) / jnp.maximum(var_src, eps)
    else:
        scale = jnp.ones(h.shape[:-2], h.dtype)
    sr = r * scale[..., None, None]
    t = ref_centroid[..., 0, :] - jnp.einsum(
        "...ij,...j->...i", sr, src_centroid[..., 0, :]
    )
    return transform_from_rotation_translation(sr, t)
