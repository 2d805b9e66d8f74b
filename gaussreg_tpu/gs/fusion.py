"""GS model fusion: transform model B by an estimated similarity and merge.

reference: gs_fusion.py:231-262 (gaussian_fuse). The heavy per-gaussian math
(xyz transform, log-scale shift, quaternion composition, SH rotation,
midpoint-distance keep filter) runs as jitted jnp ops on device; file IO and
orchestration stay on host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gaussreg_tpu.gs import sh as sh_mod
from gaussreg_tpu.gs.ply import GaussianModel, load_gaussians, save_gaussians
from gaussreg_tpu.ops.transforms import (
    matrix_to_quaternion,
    quaternion_to_matrix,
)


@jax.jit
def _transform_gaussians_device(xyz, scales, rots, f_rest, transform):
    """Apply a similarity transform (4,4 with s*R block) to gaussian params.

    reference gs_fusion.py:236-245: xyz' = xyz R^T s + t; log-scales shift by
    log(s); rotations left-composed with R; SH bands rotated."""
    a = transform[:3, :3]
    t = transform[:3, 3]
    scale = jnp.sqrt((a @ a.T)[0, 0])
    r = a / scale

    xyz_t = xyz @ r.T * scale + t
    scales_t = scales + jnp.log(scale)
    rot_mats = quaternion_to_matrix(rots)
    rots_t = matrix_to_quaternion(r[None] @ rot_mats)
    f_rest_t = sh_mod.rotate_sh_rest(f_rest, r)
    return xyz_t, scales_t, rots_t, f_rest_t


@jax.jit
def _keep_masks_device(xyz1, xyz2):
    """Midpoint filter: keep a point iff it is closer to its own cloud's
    centroid than to the other cloud's (reference gs_fusion.py:252-255).

    Cloud 1 keeps ties (<=): with perfectly-aligned clouds (coincident
    centroids) the reference's strict < on both sides drops every point of
    both models; the asymmetric tie-break keeps exactly one copy instead."""
    c1 = xyz1.mean(0)
    c2 = xyz2.mean(0)
    keep1 = jnp.linalg.norm(xyz1 - c1, axis=1) <= jnp.linalg.norm(xyz1 - c2, axis=1)
    keep2 = jnp.linalg.norm(xyz2 - c2, axis=1) < jnp.linalg.norm(xyz2 - c1, axis=1)
    return keep1, keep2


def transform_gaussians(g: GaussianModel, transform: np.ndarray) -> GaussianModel:
    """Host wrapper: similarity-transform a GaussianModel."""
    xyz, scales, rots, f_rest = _transform_gaussians_device(
        jnp.asarray(g.xyz, jnp.float32),
        jnp.asarray(g.scales, jnp.float32),
        jnp.asarray(g.rots, jnp.float32),
        jnp.asarray(g.f_rest, jnp.float32),
        jnp.asarray(transform, jnp.float32),
    )
    return GaussianModel(
        xyz=np.asarray(xyz),
        f_dc=g.f_dc,
        f_rest=np.asarray(f_rest),
        opacity=g.opacity,
        scales=np.asarray(scales),
        rots=np.asarray(rots),
    )


def fuse_gaussians(
    g1: GaussianModel, g2: GaussianModel, transform: np.ndarray
) -> GaussianModel:
    """Transform g2 into g1's frame and merge with the midpoint keep filter
    (reference gs_fusion.py:231-262)."""
    g2t = transform_gaussians(g2, transform)
    keep1, keep2 = _keep_masks_device(
        jnp.asarray(g1.xyz, jnp.float32), jnp.asarray(g2t.xyz, jnp.float32)
    )
    k1 = np.asarray(keep1)
    k2 = np.asarray(keep2)

    def cat(a, b):
        return np.concatenate([a[k1], b[k2]], axis=0)

    return GaussianModel(
        xyz=cat(g1.xyz, g2t.xyz),
        f_dc=cat(g1.f_dc, g2t.f_dc),
        f_rest=cat(g1.f_rest, g2t.f_rest),
        opacity=cat(g1.opacity, g2t.opacity),
        scales=cat(g1.scales, g2t.scales),
        rots=cat(g1.rots, g2t.rots),
    )


def gaussian_fuse(
    input_path_1: str, input_path_2: str, transform_path: str, output_path: str
) -> None:
    """CLI-level entry matching the reference signature
    (gs_fusion.py:231-262): fuses two GS .ply models given an
    estimated_transform .npz and writes the merged .ply."""
    g1 = load_gaussians(input_path_1)
    g2 = load_gaussians(input_path_2)
    transform = np.load(transform_path)["estimated_transform"]
    fused = fuse_gaussians(g1, g2, transform)
    save_gaussians(output_path, fused)
