"""Public rasterizer API: differentiable 3DGS rendering on TPU.

render() = project (jnp, autodiff) -> sort-based binning (one XLA sort,
stop-grad; binning.py) -> rasterize_gaussians (custom VJP in kernels.py:
pair-gather + Pallas tile compositing forward; Pallas backward writing
private per-pair gradient blocks + position-table gather accumulation).
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


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray  # (H, W, 3)
    depth: jnp.ndarray  # (H, W) alpha-weighted expected depth
    transmittance: jnp.ndarray  # (H, W)
    radii: jnp.ndarray  # (G,) screen radii (0 = culled)
    num_pairs: jnp.ndarray  # () int32
    overflow: jnp.ndarray  # () int32 pairs dropped by the per-gaussian cap
    overflow_cap: jnp.ndarray  # () int32 pairs dropped by pair capacity
    sat_blocks: jnp.ndarray  # () int32 backward compacted-block demand
    # (kernels.py SATURATION COMPACTION; size bwd_capacity_blocks >= this)
    sat_depth: jnp.ndarray  # (num_padded_tiles,) f32 per-tile saturation
    # depth (+inf where the tile never saturated). Feed back into the next
    # render of ~the same scene to cull pairs behind saturation (they
    # contribute < T_EPS to pixels and zero gradient).
    num_live: jnp.ndarray  # () int32 gaussians surviving the saturation
    # cull (== valid count when no sat_depth was given); sizes live_cap


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
        "bwd_capacity_blocks",
        "live_gaussian_cap",
        "sat_margin",
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
    sat_depth,
    camera_static,
    tile_h,
    tile_w,
    max_tiles_per_gaussian,
    sh_degree,
    use_pallas,
    pair_capacity_blocks,
    bwd_capacity_blocks,
    live_gaussian_cap,
    sat_margin,
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
        hp = _round_up(height, tile_h)
        wp = _round_up(width, tile_w)
        ntiles = (hp // tile_h) * (wp // tile_w)
        return RenderOutput(
            rgb, depth, t, proj.radii, jnp.sum(proj.valid), zero, zero, zero,
            jnp.full((ntiles,), jnp.inf, jnp.float32),
            jnp.sum(proj.valid).astype(jnp.int32),
        )

    hp = _round_up(height, tile_h)
    wp = _round_up(width, tile_w)
    (
        rgb, depth, t, num_pairs, overflow, overflow_cap, sat,
        sat_depth_out, num_live,
    ) = _bin_and_rasterize(
        proj, hp, wp, tile_h, tile_w, max_tiles_per_gaussian,
        pair_capacity_blocks, bwd_capacity_blocks,
        sat_depth=sat_depth, live_cap=live_gaussian_cap,
        sat_margin=sat_margin,
    )
    return RenderOutput(
        rgb[:height, :width],
        depth[:height, :width],
        t[:height, :width],
        proj.radii,
        num_pairs,
        overflow,
        overflow_cap,
        sat,
        sat_depth_out,
        num_live,
    )


def _bin_and_rasterize(
    proj, hp, wp, tile_h, tile_w, max_tiles_per_gaussian,
    pair_capacity_blocks, bwd_capacity_blocks=None, sat_depth=None,
    live_cap=None, sat_margin=1.05,
):
    """Binning + Pallas tile compositing over an (hp, wp) image whose pixel
    frame matches proj.means2d (callers shard by shifting means2d)."""
    g = proj.means2d.shape[0]
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
        chunk=kernels.CHUNK,
        pair_capacity_blocks=pair_capacity_blocks,
        extents=sg(proj.extents),
        minor=sg(proj.minor),
        sat_depth=sat_depth,
        live_cap=live_cap,
        sat_margin=sat_margin,
    )

    coeffs = kernels.quadratic_coeffs(
        proj.means2d, proj.conics, proj.opacities
    )  # (G, 6)
    zeros2 = jnp.zeros((g, 2), jnp.float32)
    gdata = jnp.concatenate(
        [coeffs, zeros2, proj.colors, proj.depths[:, None], zeros2, zeros2],
        axis=1,
    )  # (G, NCHAN)
    # sentinel row: power -> -inf so alpha == 0
    sentinel = jnp.zeros((1, kernels.NCHAN), jnp.float32).at[0, 0].set(-1e30)
    gdata = jnp.concatenate([gdata, sentinel], axis=0)

    rgb, depth, t, kend = kernels.rasterize_gaussians(
        gdata,
        binning.sorted_gid,
        binning.starts,
        hp,
        wp,
        tile_h,
        tile_w,
        bwd_capacity_blocks,
    )

    # per-tile saturation depth for the NEXT render of ~this scene: the
    # depth of the last pair the forward composited when it early-exited
    # (saturated), +inf when the tile consumed all its pairs. All ops here
    # are (num_tiles,)-sized — negligible.
    chunk_n = kernels.CHUNK
    cap = binning.sorted_gid.shape[0]
    c0 = jnp.minimum(binning.starts[:-1], cap)
    c1 = jnp.minimum(binning.starts[1:], cap)
    start_blk = c0 // chunk_n
    nch = jnp.where(c1 > c0, (c1 - 1) // chunk_n - start_blk + 1, 0)
    saturated = kend < nch
    e_last = jnp.clip(
        jnp.minimum((start_blk + kend) * chunk_n, c1) - 1, 0, cap - 1
    )
    gid_last = binning.sorted_gid[e_last]
    depths_pad = jnp.concatenate(
        [sg(proj.depths), jnp.full((1,), jnp.inf, jnp.float32)]
    )
    d_last = depths_pad[jnp.clip(gid_last, 0, g)]
    sat_depth_out = jnp.where(saturated, d_last, jnp.inf)

    return (
        rgb, depth, t, binning.num_pairs, binning.overflow,
        binning.overflow_cap + binning.live_overflow,
        jnp.sum(kend).astype(jnp.int32), sat_depth_out, binning.num_live,
    )


def render(
    means3d,
    scales,
    quats,
    opacities,
    sh_coeffs,
    camera: Camera,
    valid=None,
    tile_h: int = 32,
    tile_w: int = 32,
    max_tiles_per_gaussian: int = 16,
    sh_degree: int = 3,
    use_pallas: bool | None = None,
    pair_capacity_blocks: int | None = None,
    bwd_capacity_blocks: int | None = None,
    sat_depth=None,
    live_gaussian_cap: int | None = None,
    sat_margin: float = 1.05,
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
        bwd_capacity_blocks: static cap on the backward's saturation-
            compacted buffers (kernels.py); None = never-overflow default.
            For repeated renders of saturated scenes, size it from
            RenderOutput.sat_blocks to shrink the gradient pipeline.
        sat_depth: (num_padded_tiles,) per-tile saturation depths from a
            previous RenderOutput of ~this scene (same camera intrinsics +
            tile sizes). Gaussians behind every reachable tile's
            saturation depth contribute < T_EPS and are culled before the
            pair sort (binning.py).
        live_gaussian_cap: static cap on post-cull gaussians; compacts the
            live set so the pair sort shrinks from G*mt to cap*mt keys.
            Size it from RenderOutput.num_live of a sat_depth probe.
            Overage is counted in overflow_cap, never silently dropped.
        sat_margin: multiplicative slack on sat_depth (tolerates small
            scene/pose deltas between the probe and this render).
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
        sat_depth,
        camera_static,
        tile_h,
        tile_w,
        max_tiles_per_gaussian,
        sh_degree,
        bool(use_pallas),
        pair_capacity_blocks,
        bwd_capacity_blocks,
        live_gaussian_cap,
        float(sat_margin),
    )


def render_sharded(
    means3d,
    scales,
    quats,
    opacities,
    sh_coeffs,
    camera: Camera,
    mesh,
    axis_name: str = "data",
    valid=None,
    tile_h: int = 32,
    tile_w: int = 32,
    max_tiles_per_gaussian: int = 16,
    sh_degree: int = 3,
    pair_capacity_blocks: int | None = None,
    bwd_capacity_blocks: int | None = None,
    sat_depth=None,
    live_gaussian_cap: int | None = None,
    sat_margin: float = 1.05,
) -> RenderOutput:
    """Multi-chip differentiable render: image rows sharded over `axis_name`.

    Tiles are independent (SURVEY §5 long-context row), so each device
    projects the (replicated) gaussians, bins only its horizontal slice of
    the image — the circle-rect tile cull drops gaussians that don't reach
    the slice — and composites its rows with the same Pallas kernels as
    `render()`. Collectives: none in forward (projection is replicated
    compute, ~0.1 ms); backward all-reduces the gaussian-parameter
    cotangents via shard_map's transpose of the replicated in_specs, riding
    ICI. Output rgb/depth/transmittance are row-sharded device arrays;
    num_pairs / overflow / overflow_cap are psum'd totals.

    Saturation culling matches `render()` (v5): `sat_depth` is the
    row-sharded per-tile depth array a previous `render_sharded` of ~this
    scene emitted (slice-local tile grids stack to the global row-major
    grid, so the fed-back array re-shards to exactly the tiles each slice
    owns). `live_gaussian_cap` / `bwd_capacity_blocks` are PER-SLICE
    static caps; size them from a probe's `num_live` / `sat_blocks`, which
    this path reports as the MAX over slices (each slice culls and
    compacts independently — a sum would over-size every slice).

    mt-overflow accounting is per-slice (a gaussian's bbox is clipped to
    each slice before the `max_tiles_per_gaussian` cap), so `overflow` can
    read lower than the single-device count for the same scene — it is
    still an upper bound on dropped pairs.
    """
    from jax.sharding import PartitionSpec as P

    if valid is None:
        valid = jnp.ones(means3d.shape[0], bool)
    ndev = mesh.shape[axis_name]
    height, width = int(camera.height), int(camera.width)
    hp = _round_up(height, ndev * tile_h)
    wp = _round_up(width, tile_w)
    local_h = hp // ndev
    camera_static = (
        float(camera.fx),
        float(camera.fy),
        float(camera.cx),
        float(camera.cy),
        width,
        height,
    )
    has_sat = sat_depth is not None

    def slice_body(means3d, scales, quats, opacities, sh_coeffs, w2c, valid,
                   *rest):
        fx, fy, cx, cy, w, h = camera_static
        cam = Camera(w2c, fx, fy, cx, cy, w, h)
        proj = project_gaussians(
            means3d, scales, quats, opacities, sh_coeffs, cam,
            valid=valid, sh_degree=sh_degree,
        )
        y_off = (jax.lax.axis_index(axis_name) * local_h).astype(jnp.float32)
        shift = jnp.stack([jnp.float32(0.0), y_off])
        proj = proj._replace(means2d=proj.means2d - shift)
        (
            rgb, depth, t, num_pairs, overflow, overflow_cap, sat_blocks,
            sat_depth_loc, num_live,
        ) = _bin_and_rasterize(
            proj, local_h, wp, tile_h, tile_w, max_tiles_per_gaussian,
            pair_capacity_blocks, bwd_capacity_blocks,
            sat_depth=rest[0] if has_sat else None,
            live_cap=live_gaussian_cap, sat_margin=sat_margin,
        )
        sums = jax.lax.psum(
            jnp.stack([num_pairs, overflow, overflow_cap]), axis_name
        )
        # per-slice static caps are sized from the busiest slice
        maxes = jax.lax.pmax(jnp.stack([sat_blocks, num_live]), axis_name)
        # local tile grids stack to the global row-major grid (each slice
        # owns local_h/tile_h consecutive tile rows)
        return rgb, depth, t, proj.radii, sums, maxes, sat_depth_loc

    body = jax.shard_map(
        slice_body,
        mesh=mesh,
        in_specs=(P(),) * 7 + ((P(axis_name),) if has_sat else ()),
        out_specs=(
            P(axis_name), P(axis_name), P(axis_name), P(), P(), P(),
            P(axis_name),
        ),
        check_vma=False,
    )
    args = (means3d, scales, quats, opacities, sh_coeffs, camera.w2c, valid)
    if has_sat:
        args += (sat_depth,)
    rgb, depth, t, radii, sums, maxes, sat_depth_all = body(*args)
    return RenderOutput(
        rgb[:height, :width],
        depth[:height, :width],
        t[:height, :width],
        radii,
        sums[0],
        sums[1],
        sums[2],
        maxes[0],
        sat_depth_all,
        maxes[1],
    )
