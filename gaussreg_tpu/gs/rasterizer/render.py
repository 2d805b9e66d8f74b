"""Public rasterizer API: differentiable 3DGS rendering on TPU.

render() = project (jnp, autodiff) -> tile-sort renumbering (locality for
the gradient accumulator) -> bin (Pallas rank kernel + one scatter,
stop-grad) -> pair-gather into channel-major blocks (custom VJP: the
backward is the one-hot-matmul accumulation kernel in accum.py) -> Pallas
tile compositing (custom VJP).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussreg_tpu.gs.rasterizer import kernels
from gaussreg_tpu.gs.rasterizer.accum import accumulate_pair_grads
from gaussreg_tpu.gs.rasterizer.binning import bin_gaussians
from gaussreg_tpu.gs.rasterizer.camera import Camera
from gaussreg_tpu.gs.rasterizer.project import project_gaussians

GBLOCK = 256


@jax.custom_vjp
def _permute_rows(x, perm, inv_perm):
    """x[perm] with an exact inverse-permutation VJP (avoids the scatter-add
    XLA emits for the VJP of general gathers)."""
    return x[perm]


def _permute_rows_fwd(x, perm, inv_perm):
    return x[perm], inv_perm


def _permute_rows_bwd(inv_perm, ct):
    return ct[inv_perm], None, None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


@jax.custom_vjp
def _gather_pairs(gdata, pair_ids, gblock_lo, gblock_hi):
    """Channel-major pair blocks (nblk, NCHAN, chunk) = gdata rows at
    pair_ids. The VJP runs the accumulation kernel (accum.py) instead of
    XLA's scatter-add."""
    nblk, chunk = pair_ids.shape
    rows = gdata[pair_ids.reshape(-1)]  # (cap, NCHAN)
    return rows.reshape(nblk, chunk, kernels.NCHAN).transpose(0, 2, 1)


def _gather_pairs_fwd(gdata, pair_ids, gblock_lo, gblock_hi):
    out = _gather_pairs(gdata, pair_ids, gblock_lo, gblock_hi)
    return out, (gdata.shape[0], pair_ids, gblock_lo, gblock_hi)


def _gather_pairs_bwd(res, ct):
    g1, pair_ids, gblock_lo, gblock_hi = res
    acc = accumulate_pair_grads(ct, pair_ids, gblock_lo, gblock_hi, GBLOCK)
    d_gdata = jnp.zeros((g1, kernels.NCHAN), ct.dtype)
    d_gdata = d_gdata.at[: g1 - 1].set(acc[: g1 - 1])  # sentinel row -> 0
    return d_gdata, None, None, None


_gather_pairs.defvjp(_gather_pairs_fwd, _gather_pairs_bwd)


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray  # (H, W, 3)
    depth: jnp.ndarray  # (H, W) alpha-weighted expected depth
    transmittance: jnp.ndarray  # (H, W)
    radii: jnp.ndarray  # (G,) screen radii (0 = culled)
    num_pairs: jnp.ndarray  # () int32
    overflow: jnp.ndarray  # () int32 pairs dropped by the per-gaussian cap
    overflow_cap: jnp.ndarray  # () int32 pairs dropped by pair capacity


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
        "pair_capacity_blocks",
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
    pair_capacity_blocks,
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
        zero = jnp.zeros((), jnp.int32)
        return RenderOutput(
            rgb, depth, t, proj.radii, jnp.sum(proj.valid), zero, zero
        )

    hp = _round_up(height, tile_h)
    wp = _round_up(width, tile_w)
    ntx = wp // tile_w
    g = means3d.shape[0]
    sg = jax.lax.stop_gradient

    # renumber gaussians by their first touched tile: the gradient
    # accumulator's per-gaussian-block pair ranges become short (locality),
    # and correctness never depends on it
    x0 = jnp.clip(
        jnp.floor((proj.means2d[:, 0] - proj.radii) / tile_w), 0, ntx - 1
    )
    y0 = jnp.clip(
        jnp.floor((proj.means2d[:, 1] - proj.radii) / tile_h),
        0,
        hp // tile_h - 1,
    )
    first_tid = jnp.where(
        proj.radii > 0, y0 * ntx + x0, jnp.float32(ntx * (hp // tile_h))
    )
    perm = jnp.argsort(sg(first_tid)).astype(jnp.int32)
    inv_perm = jnp.zeros((g,), jnp.int32).at[perm].set(
        jnp.arange(g, dtype=jnp.int32)
    )

    def pm(a):
        return _permute_rows(a, perm, inv_perm)

    means2d_p = pm(proj.means2d)
    conics_p = pm(proj.conics)
    colors_p = pm(proj.colors)
    opac_p = pm(proj.opacities)
    depths_p = pm(proj.depths)
    radii_p = proj.radii[perm]

    binning = bin_gaussians(
        sg(means2d_p),
        sg(radii_p),
        sg(depths_p),
        wp,
        hp,
        tile_w=tile_w,
        tile_h=tile_h,
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        chunk=kernels.CHUNK,
        pair_capacity_blocks=pair_capacity_blocks,
        gblock=GBLOCK,
    )

    coeffs = kernels.quadratic_coeffs(means2d_p, conics_p, opac_p)  # (G, 6)
    zeros2 = jnp.zeros((g, 2), jnp.float32)
    gdata = jnp.concatenate(
        [coeffs, zeros2, colors_p, depths_p[:, None], zeros2, zeros2],
        axis=1,
    )  # (G, NCHAN)
    # sentinel row: power -> -inf so alpha == 0
    sentinel = jnp.zeros((1, kernels.NCHAN), jnp.float32).at[0, 0].set(-1e30)
    gdata = jnp.concatenate([gdata, sentinel], axis=0)

    pair_blocks = _gather_pairs(
        gdata, binning.pair_ids, binning.gblock_lo, binning.gblock_hi
    )

    rgb, depth, t = kernels.rasterize_pairs(
        pair_blocks,
        binning.tile_offsets_blk,
        binning.tile_counts,
        hp,
        wp,
        tile_h,
        tile_w,
    )
    return RenderOutput(
        rgb[:height, :width],
        depth[:height, :width],
        t[:height, :width],
        proj.radii,
        binning.num_pairs,
        binning.overflow,
        binning.overflow_cap,
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
    pair_capacity_blocks: int | None = None,
) -> RenderOutput:
    """Differentiable render of a 3DGS model from `camera`.

    Args:
        means3d: (G, 3); scales: (G, 3) linear; quats: (G, 4) wxyz;
        opacities: (G,) in [0, 1]; sh_coeffs: (G, 3, K).
        use_pallas: force the Pallas tile path (default: auto — Pallas on
            TPU, reference XLA renderer elsewhere).
        pair_capacity_blocks: static total pair capacity in CHUNK-sized
            blocks (default: worst case G*mt; overflow is counted in
            RenderOutput.overflow_cap either way).
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
        pair_capacity_blocks,
    )
