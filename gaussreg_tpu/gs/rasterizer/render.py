"""Public rasterizer API: differentiable 3DGS rendering on TPU.

render() = project (jnp, autodiff) -> bin (index work, stop-grad) ->
pair-gather (autodiff; its VJP is the XLA scatter-add that accumulates
per-pair gradients back to gaussians) -> Pallas tile compositing
(custom VJP).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussreg_tpu.gs.rasterizer import kernels
from gaussreg_tpu.gs.rasterizer.binning import bin_gaussians
from gaussreg_tpu.gs.rasterizer.camera import Camera
from gaussreg_tpu.gs.rasterizer.project import project_gaussians


@jax.custom_vjp
def _gather_pairs(gdata, pids, pair_positions):
    """pair_rows = gdata[pids] with a gather+reduce VJP: per-pair cotangents
    are gathered back through `pair_positions` (G, mt) and summed over the
    slot axis — avoiding XLA's slow large scatter-add on TPU."""
    return gdata[pids]


def _gather_pairs_fwd(gdata, pids, pair_positions):
    return gdata[pids], (gdata.shape, pair_positions)


def _gather_pairs_bwd(res, ct):
    (gshape, pair_positions) = res
    cap = ct.shape[0]
    ct_padded = jnp.concatenate([ct, jnp.zeros((1, ct.shape[1]), ct.dtype)])
    per_gaussian = ct_padded[jnp.minimum(pair_positions, cap)]  # (G, mt, C)
    d_gdata = jnp.zeros(gshape, ct.dtype)
    d_gdata = d_gdata.at[: pair_positions.shape[0]].set(
        jnp.sum(per_gaussian, axis=1)
    )
    return d_gdata, None, None


_gather_pairs.defvjp(_gather_pairs_fwd, _gather_pairs_bwd)


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray  # (H, W, 3)
    depth: jnp.ndarray  # (H, W) alpha-weighted expected depth
    transmittance: jnp.ndarray  # (H, W)
    radii: jnp.ndarray  # (G,) screen radii (0 = culled)
    num_pairs: jnp.ndarray  # () int32
    overflow: jnp.ndarray  # () int32 pairs dropped by the per-gaussian cap


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=(
        "camera_static",
        "tile_h",
        "tile_w",
        "max_tiles_per_gaussian",
        "sh_degree",
        "use_pallas",
    ),
)
def _render_impl(
    means3d,
    scales,
    quats,
    opacities,
    sh_coeffs,
    w2c,
    valid,
    camera_static,
    tile_h,
    tile_w,
    max_tiles_per_gaussian,
    sh_degree,
    use_pallas,
):
    fx, fy, cx, cy, width, height = camera_static
    camera = Camera(w2c, fx, fy, cx, cy, width, height)
    proj = project_gaussians(
        means3d,
        scales,
        quats,
        opacities,
        sh_coeffs,
        camera,
        valid=valid,
        sh_degree=sh_degree,
    )

    if not use_pallas:
        from gaussreg_tpu.gs.rasterizer.reference import render_reference

        rgb, depth, t = render_reference(proj, width, height)
        return RenderOutput(
            rgb, depth, t, proj.radii, jnp.sum(proj.valid),
            jnp.zeros((), jnp.int32),
        )

    hp = _round_up(height, tile_h)
    wp = _round_up(width, tile_w)

    sg = jax.lax.stop_gradient
    binning = bin_gaussians(
        sg(proj.means2d),
        sg(proj.radii),
        sg(proj.depths),
        wp,
        hp,
        tile_w=tile_w,
        tile_h=tile_h,
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        align=kernels.CHUNK,
    )

    g = means3d.shape[0]
    gdata = jnp.concatenate(
        [
            kernels.quadratic_coeffs(proj.means2d, proj.conics),
            proj.opacities[:, None],
            proj.colors,
            proj.depths[:, None],
        ],
        axis=1,
    )  # (G, 11)
    gdata = jnp.pad(gdata, ((0, 1), (0, kernels.NCHAN - gdata.shape[1])))
    # padding slots gather the all-zero row G (alpha 0 -> no-op); the VJP
    # routes per-pair gradients back via the (G, mt) position table
    pids = jnp.where(binning.pair_valid, binning.pair_gaussian, g)
    pair_rows = _gather_pairs(gdata, pids, binning.pair_positions)

    rgb, depth, t = kernels.rasterize_pairs(
        pair_rows, binning.tile_offsets, binning.tile_counts, hp, wp, tile_h, tile_w
    )
    return RenderOutput(
        rgb[:height, :width],
        depth[:height, :width],
        t[:height, :width],
        proj.radii,
        binning.num_pairs,
        binning.overflow,
    )


def render(
    means3d,
    scales,
    quats,
    opacities,
    sh_coeffs,
    camera: Camera,
    valid=None,
    tile_h: int = 16,
    tile_w: int = 32,
    max_tiles_per_gaussian: int = 16,
    sh_degree: int = 3,
    use_pallas: bool | None = None,
) -> RenderOutput:
    """Differentiable render of a 3DGS model from `camera`.

    Args:
        means3d: (G, 3); scales: (G, 3) linear; quats: (G, 4) wxyz;
        opacities: (G,) in [0, 1]; sh_coeffs: (G, 3, K).
        use_pallas: force the Pallas tile path (default: auto — Pallas on
            TPU, reference XLA renderer elsewhere).
    """
    if valid is None:
        valid = jnp.ones(means3d.shape[0], bool)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    camera_static = (
        float(camera.fx),
        float(camera.fy),
        float(camera.cx),
        float(camera.cy),
        int(camera.width),
        int(camera.height),
    )
    return _render_impl(
        means3d,
        scales,
        quats,
        opacities,
        sh_coeffs,
        camera.w2c,
        valid,
        camera_static,
        tile_h,
        tile_w,
        max_tiles_per_gaussian,
        sh_degree,
        bool(use_pallas),
    )
