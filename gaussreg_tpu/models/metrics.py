"""Registration metrics: RRE / RTE / RSE (with scale), RMSE, recall.

reference: geotransformer/modules/registration/metrics.py:47-125 and
geotransformer/utils/registration.py:18-98 (the numpy twin used by the test
CLI); the evaluator flow follows experiments/.../loss.py:95-162.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from gaussreg_tpu.config import Config
from gaussreg_tpu.ops.transforms import (
    apply_transform,
    rotation_translation_scale_from_transform,
)


def relative_rotation_error(gt_rotation, rotation):
    """degrees; reference metrics.py:47-65."""
    mat = jnp.swapaxes(rotation, -1, -2) @ gt_rotation
    trace = mat[..., 0, 0] + mat[..., 1, 1] + mat[..., 2, 2]
    x = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    return 180.0 * jnp.arccos(x) / jnp.pi


def relative_translation_error(gt_translation, translation):
    """norm-ratio (dimensionless); reference metrics.py:68-81."""
    return jnp.linalg.norm(gt_translation - translation, axis=-1) / jnp.linalg.norm(
        gt_translation, axis=-1
    )


def relative_scale_error(gt_scale, scale):
    """reference metrics.py:83-95."""
    return jnp.abs(gt_scale - scale) / jnp.abs(gt_scale)


def isotropic_transform_error(gt_transform, transform):
    """(rre_deg, rte, rse) for similarity transforms
    (reference metrics.py:97-125)."""
    gt_r, gt_t, gt_s = rotation_translation_scale_from_transform(gt_transform)
    r, t, s = rotation_translation_scale_from_transform(transform)
    return (
        relative_rotation_error(gt_r, r),
        relative_translation_error(gt_t, t),
        relative_scale_error(gt_s, s),
    )


def registration_rmse(src_points, src_mask, gt_transform, est_transform):
    """Mean realignment residual of src points
    (reference loss.py:146-148)."""
    realign = jnp.linalg.inv(gt_transform) @ est_transform
    moved = apply_transform(src_points, realign)
    res = jnp.linalg.norm(moved - src_points, axis=-1)
    return jnp.sum(jnp.where(src_mask, res, 0.0)) / jnp.maximum(
        jnp.sum(src_mask), 1
    )


def evaluate_registration(
    cfg: Config,
    gt_transform,
    est_transform,
    src_points,
    src_mask,
) -> Dict[str, jnp.ndarray]:
    """reference loss.py:132-151 (normalized frame; un-normalization to the
    original frame is the caller's job, see eval CLI)."""
    rre, rte, rse = isotropic_transform_error(gt_transform, est_transform)
    rmse = registration_rmse(src_points, src_mask, gt_transform, est_transform)
    recall = (rmse < cfg.eval.rmse_threshold).astype(jnp.float32)
    return {"RRE": rre, "RTE": rte, "RSE": rse, "RMSE": rmse, "RR": recall}


def unnormalize_transform(
    est_transform: np.ndarray,
    ref_adjust_scale: float,
    src_adjust_scale: float,
    ref_center: np.ndarray,
    src_center: np.ndarray,
) -> np.ndarray:
    """Map a transform estimated in the volume-normalized frame back to the
    original GS frame (reference test.py:181-185)."""
    out = np.zeros_like(est_transform)
    out[:3, :3] = est_transform[:3, :3] / ref_adjust_scale * src_adjust_scale
    out[:3, 3] = (
        est_transform[:3, 3] / ref_adjust_scale
        + ref_center
        - out[:3, :3] @ src_center
    )
    out[3, 3] = 1.0
    return out
