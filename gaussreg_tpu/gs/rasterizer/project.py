"""EWA projection of 3D gaussians to screen space (pure jnp, differentiable).

The math follows the 3DGS formulation (Kerbl et al. 2023): world covariance
Sigma = R S S^T R^T from quaternion+log-scale parameters, camera-space
covariance W Sigma W^T, perspective Jacobian J, screen covariance
Sigma' = J W Sigma W^T J^T + 0.3 I, inverse conic for the exponent, and a
3-sigma screen radius. This is the differentiable front end of the Pallas
tile rasterizer (SURVEY.md §7.2 step 6; no counterpart exists in the
reference snapshot — its fine registration lives on an unreleased branch,
reference README.md:63-65).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gaussreg_tpu.gs import sh as sh_mod
from gaussreg_tpu.gs.rasterizer.camera import Camera
from gaussreg_tpu.ops.transforms import quaternion_to_matrix


class ProjectedGaussians(NamedTuple):
    means2d: jnp.ndarray  # (G, 2) pixel coords
    depths: jnp.ndarray  # (G,)
    conics: jnp.ndarray  # (G, 3) inverse-covariance (a, b, c): a dx^2 + 2b dxdy + c dy^2
    colors: jnp.ndarray  # (G, 3)
    opacities: jnp.ndarray  # (G,)
    radii: jnp.ndarray  # (G,) float screen-space 3-sigma radius (0 if culled)
    valid: jnp.ndarray  # (G,) bool
    # anisotropic cull data (binning.py): the ellipse's axis-aligned
    # half-extents and its minor-axis slab (ux, uy, half_width) — the
    # ellipse {d^2_cov <= nsigma^2} lies inside bbox AND slab, so tiles
    # outside either can never see alpha >= 1/255 (exactly the same
    # criterion as the isotropic radius, just tighter for thin splats)
    extents: jnp.ndarray  # (G, 2) float (hx, hy)
    minor: jnp.ndarray  # (G, 3) float (ux, uy, slab half-width)


def compute_cov3d(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """(G, 3) linear scales + (G, 4) wxyz quats -> (G, 3, 3) covariance."""
    r = quaternion_to_matrix(quats)  # (G, 3, 3)
    m = r * scales[:, None, :]  # R @ diag(s)
    return m @ jnp.swapaxes(m, -1, -2)


def _cov_cam_entries(scales, quats, w):
    """Camera-space covariance entries (c00, c01, c02, c11, c12, c22), each
    (G,) — W (R S S^T R^T) W^T computed as UNROLLED elementwise arithmetic.

    The obvious batched form ((G,3,3) @ (G,3,3) dot_generals) pads the
    3-wide contraction onto 8x128 MXU tiles: measured 2.9 ms fwd+bwd at
    G=100k on a v5e — ~30x above the flop bound. Elementwise scalar chains
    fuse into a handful of VPU passes instead (PERF.md round 4)."""
    qr, qi, qj, qk = quats[:, 0], quats[:, 1], quats[:, 2], quats[:, 3]
    two_s = 2.0 / jnp.sum(quats * quats, axis=-1)
    r = [
        [1 - two_s * (qj * qj + qk * qk), two_s * (qi * qj - qk * qr),
         two_s * (qi * qk + qj * qr)],
        [two_s * (qi * qj + qk * qr), 1 - two_s * (qi * qi + qk * qk),
         two_s * (qj * qk - qi * qr)],
        [two_s * (qi * qk - qj * qr), two_s * (qj * qk + qi * qr),
         1 - two_s * (qi * qi + qj * qj)],
    ]
    s2 = [scales[:, j] * scales[:, j] for j in range(3)]
    # cov3d[i][k] = sum_j R[i][j] R[k][j] s_j^2 (symmetric)
    c3 = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for k in range(i, 3):
            c3[i][k] = sum(r[i][j] * r[k][j] * s2[j] for j in range(3))
            c3[k][i] = c3[i][k]
    # rows of W C3: wc[i][k] = sum_j W[i,j] c3[j][k]; then (W C3) W^T
    wc = [
        [sum(w[i, j] * c3[j][k] for j in range(3)) for k in range(3)]
        for i in range(3)
    ]

    def cc(i, l):
        return sum(wc[i][k] * w[l, k] for k in range(3))

    return cc(0, 0), cc(0, 1), cc(0, 2), cc(1, 1), cc(1, 2), cc(2, 2)


def project_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    sh_coeffs: jnp.ndarray,
    camera: Camera,
    valid: jnp.ndarray | None = None,
    near: float = 0.2,
    blur: float = 0.3,
    sh_degree: int = 3,
) -> ProjectedGaussians:
    """Project gaussians into screen space.

    Args:
        means3d: (G, 3) world positions.
        scales: (G, 3) linear (post-exp) scales.
        quats: (G, 4) wxyz rotations (unnormalized ok).
        opacities: (G,) post-sigmoid opacities.
        sh_coeffs: (G, 3, K) SH color coefficients (K >= (sh_degree+1)^2).
        camera: Camera.
    """
    g = means3d.shape[0]
    if valid is None:
        valid = jnp.ones(g, bool)

    w = camera.w2c[:3, :3]
    t = camera.w2c[:3, 3]
    p_cam = means3d @ w.T + t  # (G, 3)
    z = p_cam[:, 2]
    in_front = z > near
    zc = jnp.maximum(z, near)  # clamped for stable math on culled points

    x_ndc = p_cam[:, 0] / zc
    y_ndc = p_cam[:, 1] / zc
    means2d = jnp.stack(
        [camera.fx * x_ndc + camera.cx, camera.fy * y_ndc + camera.cy], axis=1
    )

    c00, c01, c02, c11, c12, c22 = _cov_cam_entries(scales, quats, w)

    # perspective Jacobian (2, 3) per gaussian; x/y clamped to a slightly
    # expanded frustum like 3DGS to tame off-screen gradients
    lim_x = 1.3 * camera.cx / camera.fx
    lim_y = 1.3 * camera.cy / camera.fy
    tx = jnp.clip(x_ndc, -lim_x, lim_x) * zc
    ty = jnp.clip(y_ndc, -lim_y, lim_y) * zc
    fx, fy = camera.fx, camera.fy
    j00 = fx / zc
    j02 = -fx * tx / (zc * zc)
    j11 = fy / zc
    j12 = -fy * ty / (zc * zc)
    # cov2d = J cov_cam J^T, J = [[j00, 0, j02], [0, j11, j12]]
    a = j00 * (j00 * c00 + j02 * c02) + j02 * (j00 * c02 + j02 * c22) + blur
    b = j00 * (j11 * c01 + j12 * c02) + j02 * (j11 * c12 + j12 * c22)
    c = j11 * (j11 * c11 + j12 * c12) + j12 * (j11 * c12 + j12 * c22) + blur

    det = a * c - b * b
    det_safe = jnp.maximum(det, 1e-12)
    inv_a = c / det_safe
    inv_b = -b / det_safe
    inv_c = a / det_safe
    conics = jnp.stack([inv_a, inv_b, inv_c], axis=1)

    mid = 0.5 * (a + c)
    eig_gap = jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
    lambda1 = mid + eig_gap
    # opacity-aware radius: alpha = op * exp(-r^2 / (2 lambda1)) drops below
    # the rasterizer's 1/255 cutoff at r = sqrt(2 ln(255 op)) sigma_max;
    # min with the classic 3-sigma bound. Low-opacity gaussians get smaller
    # footprints, cutting (gaussian, tile) pair count with zero visual loss.
    nsigma = jnp.minimum(
        3.0, jnp.sqrt(2.0 * jnp.log(jnp.maximum(255.0 * opacities, 1.001)))
    )
    radii = jnp.ceil(nsigma * jnp.sqrt(jnp.maximum(lambda1, 0.0)))
    # cull geometry must bound the EXACT alpha >= 1/255 contour (the only
    # cutoff the compositor applies, reference.py:43) — no 3-sigma cap:
    # for op near 1 the contour sits at 3.33 sigma and capping would
    # over-cull boundary pixels with alpha up to op*e^-4.5 ~ 0.011
    nsig_cull = jnp.sqrt(2.0 * jnp.log(jnp.maximum(255.0 * opacities, 1.001)))
    # per-axis extents of that ellipse: its AABB half-widths are
    # nsig_cull * sqrt(diag(cov2d)) — tighter than the circumscribed
    # circle for anisotropic splats, identical cutoff criterion
    extents = jnp.ceil(
        nsig_cull[:, None]
        * jnp.sqrt(jnp.maximum(jnp.stack([a, c], axis=1), 0.0))
    )
    # minor principal axis (eigenvalue lambda2) and its slab half-width;
    # exact (unclamped) gap — an inflated gap would shrink lambda2 and
    # over-cull. Eigenvector formula picked by conditioning; isotropic
    # splats fall back to the x-axis (slab == circle bound — harmless)
    lambda2 = jnp.maximum(
        mid - jnp.sqrt(jnp.maximum(mid * mid - det, 0.0)), 0.0
    )
    v1 = jnp.stack([b, lambda2 - a], axis=1)
    v2 = jnp.stack([lambda2 - c, b], axis=1)
    n1 = jnp.sum(v1 * v1, axis=1)
    n2 = jnp.sum(v2 * v2, axis=1)
    v = jnp.where((n1 >= n2)[:, None], v1, v2)
    nv = jnp.sqrt(jnp.maximum(jnp.maximum(n1, n2), 1e-20))
    u = jnp.where((nv > 1e-8)[:, None], v / nv[:, None], jnp.asarray([[1.0, 0.0]]))
    minor = jnp.concatenate(
        [u, (nsig_cull * jnp.sqrt(lambda2) + 1e-3)[:, None]], axis=1
    )

    # view-dependent color
    cam_center = camera.cam_center
    dirs = means3d - cam_center
    dirs = dirs / (jnp.linalg.norm(dirs, axis=1, keepdims=True) + 1e-8)
    colors = jnp.maximum(
        sh_mod.eval_sh(sh_degree, sh_coeffs, dirs) + 0.5, 0.0
    )  # (G, 3)

    # alpha <= opacity everywhere, so op < 1/255 can never pass the
    # rasterizer's alpha cutoff — cull outright
    ok = valid & in_front & (det > 0.0) & (opacities >= 1.0 / 255.0)
    radii = jnp.where(ok, radii, 0.0)
    extents = jnp.where(ok[:, None], extents, 0.0)
    return ProjectedGaussians(
        means2d=means2d,
        depths=z,
        conics=conics,
        colors=colors,
        opacities=opacities,
        radii=radii,
        valid=ok,
        extents=extents,
        minor=minor,
    )
