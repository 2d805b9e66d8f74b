"""Tile binning: (gaussian, tile) pairs sorted by (tile, depth) — one
XLA sort, no scatter.

TPU-native equivalent of CUDA 3DGS's duplicate-and-radix-sort binning
(measured on a v5e: a 1.6M-element `lax.sort` with two payloads is ~3.5 ms —
faster than every scatter/rank-kernel alternative we tried; see PERF.md).

Design:

- Every gaussian contributes up to `mt` (gaussian, tile) entries — its
  screen bbox tiles in row-major order, circle-culled per tile (tiles whose
  rect lies farther than the opacity-aware radius from the center can never
  reach alpha >= 1/255). Overflow is counted, never silently dropped
  (SURVEY.md §7.3).
- sort1 key = tile_id << depth_bits | monotone-quantized depth (positive
  float32 bits are order-preserving, so the top bits of the depth's bit
  pattern ARE the quantized depth). Payloads: gaussian id and the linear
  (g, slot) index. One sort yields every tile's pairs contiguous and
  depth-ordered. Invalid entries key to 0xFFFFFFFF and sink to the end.
- Tile segment element offsets come from `searchsorted` (601 probes, ~0.3 ms).
  The forward rasterizer reads this UNALIGNED layout directly: a tile's first
  and last 128-wide block may be shared with the neighbouring tile, and the
  kernel row-masks foreign rows (alpha = 0 contributes nothing).
- The backward pass runs over a SATURATION-COMPACTED block list (kernels.py):
  the forward kernel reports per-tile how many chunks it composited before
  every pixel saturated, and only those blocks are re-walked; gradient rows
  scatter-add onto gaussians keyed by `sorted_gid`, so binning exports
  nothing beyond the sorted pair list itself.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBinning(NamedTuple):
    """Sorted (tile, depth)-ordered pair list.

    `sorted_gid[p]` is the gaussian id of the p-th pair in (tile, depth)
    order, `G` (sentinel) for invalid/padding slots. Tile t's pairs are
    `sorted_gid[starts[t] : starts[t + 1]]`."""

    sorted_gid: jnp.ndarray  # (cap,) int32
    starts: jnp.ndarray  # (num_tiles + 1,) int32 element offsets
    tile_counts: jnp.ndarray  # (num_tiles,) int32
    num_pairs: jnp.ndarray  # () int32 — true pair count
    overflow: jnp.ndarray  # () int32 — pairs dropped by the per-gaussian cap
    overflow_cap: jnp.ndarray  # () int32 — pairs dropped by pair capacity


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_w",
        "tile_h",
        "width",
        "height",
        "max_tiles_per_gaussian",
        "chunk",
        "pair_capacity_blocks",
    ),
)
def bin_gaussians(
    means2d: jnp.ndarray,  # (G, 2) pixel coords
    radii: jnp.ndarray,  # (G,) screen radius, 0 = culled
    depths: jnp.ndarray,  # (G,)
    width: int,
    height: int,
    tile_w: int = 32,
    tile_h: int = 16,
    max_tiles_per_gaussian: int = 16,
    chunk: int = 128,
    pair_capacity_blocks: int | None = None,
    extents: jnp.ndarray | None = None,  # (G, 2) ellipse AABB half-widths
    minor: jnp.ndarray | None = None,  # (G, 3) minor-axis slab (ux, uy, hw)
) -> TileBinning:
    g = means2d.shape[0]
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    num_tiles = ntx * nty
    mt = max_tiles_per_gaussian

    tile_bits = max(num_tiles + 1, 2).bit_length()
    depth_bits = 32 - tile_bits
    assert tile_bits <= 12, "image too large for 32-bit sort keys"

    mx = means2d[:, 0]
    my = means2d[:, 1]
    r = radii
    alive = r > 0
    # anisotropic per-axis extents: the AABB of the exact alpha >= 1/255
    # ellipse. NOT min'd with `r` (the display radius carries a 3-sigma
    # cap; the contour can sit at 3.33 sigma for opaque splats and
    # re-capping would over-cull — parity test catches it)
    hx = extents[:, 0] if extents is not None else r
    hy = extents[:, 1] if extents is not None else r

    x0 = jnp.floor((mx - hx) / tile_w).astype(jnp.int32)
    x1 = jnp.floor((mx + hx) / tile_w).astype(jnp.int32)
    y0 = jnp.floor((my - hy) / tile_h).astype(jnp.int32)
    y1 = jnp.floor((my + hy) / tile_h).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, ntx - 1)
    x1 = jnp.clip(x1, 0, ntx - 1)
    y0 = jnp.clip(y0, 0, nty - 1)
    y1 = jnp.clip(y1, 0, nty - 1)
    bw = jnp.where(alive, x1 - x0 + 1, 0)
    bh = jnp.where(alive, y1 - y0 + 1, 0)
    count = bw * bh

    # (G, mt) slot enumeration: row-major over the bbox
    slot = jnp.arange(mt, dtype=jnp.int32)
    dy = slot[None, :] // jnp.maximum(bw, 1)[:, None]
    dx = slot[None, :] % jnp.maximum(bw, 1)[:, None]
    in_bbox = slot[None, :] < jnp.minimum(count, mt)[:, None]
    tx = x0[:, None] + dx
    ty = y0[:, None] + dy
    tid = ty * ntx + tx  # (G, mt)

    # circle-rect cull: distance from the gaussian center to the tile rect
    # exceeding the (opacity-aware) radius means alpha < 1/255 everywhere in
    # the tile
    tlx = (tx * tile_w).astype(jnp.float32)
    tly = (ty * tile_h).astype(jnp.float32)
    cdx = jnp.maximum(jnp.maximum(tlx - mx[:, None], mx[:, None] - (tlx + tile_w)), 0.0)
    cdy = jnp.maximum(jnp.maximum(tly - my[:, None], my[:, None] - (tly + tile_h)), 0.0)
    # conservative circle: with extents, hypot(hx, hy) >= nsig*sqrt(lambda1)
    # (the true circumscribed radius; lambda1 <= a + c) — without, the
    # caller's radius itself
    r2_cull = (hx * hx + hy * hy) if extents is not None else r * r
    near_enough = cdx * cdx + cdy * cdy < r2_cull[:, None]
    valid = in_bbox & near_enough
    if minor is not None:
        # minor-axis slab test: the ellipse lies inside the slab
        # |u . (x - mu)| <= hw; a tile rect whose projection interval onto
        # u misses the slab can never reach alpha >= 1/255
        ux = minor[:, 0:1]
        uy = minor[:, 1:2]
        hw = minor[:, 2:3]
        rcx = tlx + 0.5 * tile_w
        rcy = tly + 0.5 * tile_h
        dproj = jnp.abs(ux * (rcx - mx[:, None]) + uy * (rcy - my[:, None]))
        rect_hw = jnp.abs(ux) * (0.5 * tile_w) + jnp.abs(uy) * (0.5 * tile_h)
        valid &= dproj <= hw + rect_hw

    # monotone depth quantization: positive float32 bit patterns sort like
    # the floats; keep the top depth_bits bits
    dbits = jax.lax.bitcast_convert_type(
        jnp.maximum(depths, 1e-9), jnp.uint32
    ) >> jnp.uint32(32 - depth_bits)
    key = (tid.astype(jnp.uint32) << jnp.uint32(depth_bits)) | dbits[:, None]
    key = jnp.where(valid, key, jnp.uint32(0xFFFFFFFF)).reshape(-1)

    gid_payload = jnp.where(
        valid, jnp.arange(g, dtype=jnp.int32)[:, None], g
    ).reshape(-1)

    key_s, gid_s = jax.lax.sort((key, gid_payload), num_keys=1)

    probes = (
        jnp.arange(num_tiles + 1, dtype=jnp.uint32) << jnp.uint32(depth_bits)
    )
    starts = jnp.searchsorted(key_s, probes).astype(jnp.int32)
    num_pairs = starts[num_tiles]
    tile_counts = jnp.diff(starts)

    if pair_capacity_blocks is None:
        pair_capacity_blocks = (g * mt + chunk - 1) // chunk
    cap = pair_capacity_blocks * chunk

    sorted_gid = gid_s[:cap]
    if cap > g * mt:
        sorted_gid = jnp.pad(sorted_gid, (0, cap - g * mt), constant_values=g)

    overflow = jnp.sum(jnp.maximum(count - mt, 0)).astype(jnp.int32)
    overflow_cap = jnp.maximum(num_pairs - cap, 0).astype(jnp.int32)
    return TileBinning(
        sorted_gid=sorted_gid,
        starts=starts,
        tile_counts=tile_counts,
        num_pairs=num_pairs,
        overflow=overflow,
        overflow_cap=overflow_cap,
    )
