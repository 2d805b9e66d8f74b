"""Vectorized correspondence-based RANSAC with scale — on device.

TPU-native replacement for the reference's Open3D CPU RANSAC
(reference: geotransformer/utils/open3d.py:169-198 called from
experiments/.../model.py:209-215): instead of a sequential host loop, all
hypotheses are sampled at once, solved with batched 3x3-SVD Umeyama, and
scored against the correspondence set with blocked residual evaluation —
thousands of hypotheses in a handful of MXU/VPU passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gaussreg_tpu.ops.procrustes import umeyama_similarity
from gaussreg_tpu.ops.transforms import apply_transform


@functools.partial(
    jax.jit,
    static_argnames=("num_iterations", "num_points", "with_scale", "refine_steps"),
)
def ransac_similarity(
    key: jax.Array,
    src_points: jnp.ndarray,
    ref_points: jnp.ndarray,
    corr_mask: jnp.ndarray,
    distance_threshold,
    num_iterations: int = 10000,
    num_points: int = 5,
    with_scale: bool = True,
    refine_steps: int = 2,
):
    """Estimate the similarity transform src -> ref from padded
    correspondences.

    Args:
        key: PRNG key.
        src_points / ref_points: (C, 3) padded correspondence endpoints.
        corr_mask: (C,) bool validity.
        distance_threshold: inlier radius (reference model.py:212: 0.05).
        num_iterations: hypothesis count (reference: 1000 train / 10000 test).
        num_points: sample size (reference: 3 train / 5 test).

    Returns:
        (transform (4, 4), inlier_count () int32).
    """
    c = src_points.shape[0]
    # uniform sampling over valid correspondences (invalid get -inf logit)
    logits = jnp.where(corr_mask, 0.0, -1e30)
    sample_idx = jax.random.categorical(
        key, logits, shape=(num_iterations, num_points)
    )  # (I, P)
    src_s = src_points[sample_idx]  # (I, P, 3)
    ref_s = ref_points[sample_idx]

    hyp = umeyama_similarity(src_s, ref_s, with_scale=with_scale)  # (I, 4, 4)

    thr2 = distance_threshold * distance_threshold

    def count_inliers(transforms):
        aligned = apply_transform(src_points[None, :, :], transforms)  # (i, C, 3)
        r2 = jnp.sum((ref_points[None] - aligned) ** 2, axis=-1)
        return jnp.sum((r2 < thr2) & corr_mask[None, :], axis=-1)

    # block the hypothesis scoring to bound memory at (block, C, 3)
    block = 512
    pad = (-num_iterations) % block
    hyp_b = jnp.concatenate([hyp, jnp.tile(jnp.eye(4)[None], (pad, 1, 1))])
    counts = jax.lax.map(count_inliers, hyp_b.reshape(-1, block, 4, 4))
    counts = counts.reshape(-1)[:num_iterations]

    best = jnp.argmax(counts)
    transform = hyp[best]

    # local refinement: refit on inliers, iterate
    def refit(transform, _):
        aligned = apply_transform(src_points, transform)
        r2 = jnp.sum((ref_points - aligned) ** 2, axis=-1)
        inliers = (r2 < thr2) & corr_mask
        w = inliers.astype(src_points.dtype)
        new_t = umeyama_similarity(src_points, ref_points, w, with_scale=with_scale)
        # keep the refit only if it doesn't lose inliers (degenerate guard)
        aligned2 = apply_transform(src_points, new_t)
        r2b = jnp.sum((ref_points - aligned2) ** 2, axis=-1)
        n_new = jnp.sum((r2b < thr2) & corr_mask)
        n_old = jnp.sum(inliers)
        out = jnp.where(n_new >= n_old, new_t, transform)
        return out, None

    transform, _ = jax.lax.scan(refit, transform, None, length=refine_steps)

    aligned = apply_transform(src_points, transform)
    r2 = jnp.sum((ref_points - aligned) ** 2, axis=-1)
    inlier_count = jnp.sum((r2 < thr2) & corr_mask).astype(jnp.int32)
    return transform, inlier_count
