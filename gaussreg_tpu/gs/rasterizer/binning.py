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
    num_live: jnp.ndarray  # () int32 — gaussians alive after saturation cull
    live_overflow: jnp.ndarray  # () int32 — live gaussians beyond live_cap
    # (their pairs are dropped; size live_cap from a probe's num_live)


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
        "live_cap",
        "sat_margin",
    ),
)
def bin_gaussians(
    means2d: jnp.ndarray,  # (G, 2) pixel coords
    radii: jnp.ndarray,  # (G,) screen radius, 0 = culled
    depths: jnp.ndarray,  # (G,)
    width: int,
    height: int,
    tile_w: int = 32,
    tile_h: int = 32,
    max_tiles_per_gaussian: int = 16,
    chunk: int = 128,
    pair_capacity_blocks: int | None = None,
    extents: jnp.ndarray | None = None,  # (G, 2) ellipse AABB half-widths
    minor: jnp.ndarray | None = None,  # (G, 3) minor-axis slab (ux, uy, hw)
    sat_depth: jnp.ndarray | None = None,  # (num_tiles,) per-tile saturation
    # depth from a previous render of (approximately) this scene (+inf =
    # tile never saturated). Gaussians strictly behind every reachable
    # tile's saturation depth contribute < T_EPS and are culled.
    live_cap: int | None = None,  # static cap on post-cull gaussians; when
    # set the live set is COMPACTED before pair expansion, shrinking the
    # sort from G*mt to live_cap*mt keys. Requires sat_depth.
    sat_margin: float = 1.05,  # multiplicative slack on sat_depth so small
    # scene/pose deltas between the probe and this render stay exact
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
    # anisotropic per-axis extents: the AABB of the exact alpha >= 1/255
    # ellipse. NOT min'd with `r` (the display radius carries a 3-sigma
    # cap; the contour can sit at 3.33 sigma for opaque splats and
    # re-capping would over-cull — parity test catches it)
    hx = extents[:, 0] if extents is not None else r
    hy = extents[:, 1] if extents is not None else r
    # a gaussian whose AABB misses the image rect entirely is dead. For
    # whole-image renders this is a no-op (projection culls off-screen);
    # for render_sharded's row slices it is what clips each slice's live
    # set to its own band — without it every slice would count (and, with
    # live_cap, compact) all on-screen gaussians (clamped 1x1 bboxes at
    # the border would then leak through the saturation test).
    alive = (
        (r > 0)
        & (mx + hx >= 0) & (mx - hx < width)
        & (my + hy >= 0) & (my - hy < height)
    )

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
    # the mt-cap overflow counter always reflects the full gaussian set
    overflow = jnp.sum(jnp.maximum(count - mt, 0)).astype(jnp.int32)

    # ---- saturation cull (gaussian granularity) ----
    # One lookup per GAUSSIAN, never per pair: per-pair sat_depth[tid]
    # gathers cost ~6 ns/element on this backend (PERF.md) — 1.6M of them
    # would eat the entire win. A gaussian is cullable iff its depth
    # exceeds the MAX saturation depth over its bbox tiles; that range-max
    # comes from ONE gather into a stack of ANCHORED max-pools: level w
    # holds P_w[y, x] = max sat_img[y .. y+w-1, x .. x+w-1], so a bbox
    # anchored at (y0, x0) with max dimension d is covered EXACTLY by
    # level w = d indexed at (y0, x0) — no centering slop (the round-3
    # centered-'SAME' stack over-covered even bboxes by a tile per side
    # and kept 53.8k/100k live vs the exact test's 35.5k on the bench
    # scene; anchored pools are exact for every size <= 9, PERF.md r4).
    # Larger than 9x9: live (rare; they dominate tiles anyway).
    if sat_depth is not None:
        sat_img = sat_depth.reshape(nty, ntx) * jnp.float32(sat_margin)
        pools = [sat_img]
        for w in range(2, 17):
            pools.append(
                jax.lax.reduce_window(
                    sat_img, -jnp.inf, jax.lax.max, (w, w), (1, 1),
                    ((0, w - 1), (0, w - 1)),
                )
            )
        # stack layout (num_tiles, 16): row = anchor tile, columns =
        # pool levels 1..16 (exactly one lane tile — bboxes up to 16x16
        # are covered exactly; larger stay live). ONE whole-row take per
        # gaussian + an elementwise one-hot column select — the
        # (lvl * num_tiles + tile) element-gather form costs 6.6 ns/elem
        # (0.66 ms at 100k, PERF.md round-4 trace); row takes are ~0.
        stack = jnp.stack([p.reshape(-1) for p in pools], axis=1)
        size = jnp.maximum(bw, bh)
        lvl = jnp.clip(size, 1, 16) - 1
        rows = stack[y0 * ntx + x0]  # (G, 16) row gather
        onehot = (
            lvl[:, None] == jnp.arange(16, dtype=lvl.dtype)[None, :]
        ).astype(rows.dtype)
        look = jnp.sum(rows * onehot, axis=1)
        small = size <= 16
        live = alive & ((~small) | (depths <= look))
    else:
        live = alive
    num_live = jnp.sum(live).astype(jnp.int32)

    if live_cap is not None:
        assert sat_depth is not None, "live_cap requires sat_depth"
        live_overflow = jnp.maximum(num_live - live_cap, 0).astype(jnp.int32)
        # stable: live gaussians first, original order preserved
        perm = jnp.argsort(~live, stable=True)[:live_cap]
        cols = [mx, my, hx, hy, depths, live.astype(jnp.float32)]
        if minor is not None:
            cols += [minor[:, 0], minor[:, 1], minor[:, 2]]
        packed = jnp.stack(cols, axis=1)[perm]  # one row-gather
        mx, my, hx, hy, depths = (packed[:, i] for i in range(5))
        alive = packed[:, 5] > 0.5
        if minor is not None:
            minor = packed[:, 6:9]
        gids = perm
        x0 = jnp.clip(jnp.floor((mx - hx) / tile_w).astype(jnp.int32), 0, ntx - 1)
        x1 = jnp.clip(jnp.floor((mx + hx) / tile_w).astype(jnp.int32), 0, ntx - 1)
        y0 = jnp.clip(jnp.floor((my - hy) / tile_h).astype(jnp.int32), 0, nty - 1)
        y1 = jnp.clip(jnp.floor((my + hy) / tile_h).astype(jnp.int32), 0, nty - 1)
        bw = jnp.where(alive, x1 - x0 + 1, 0)
        bh = jnp.where(alive, y1 - y0 + 1, 0)
        count = bw * bh
        n_rows = live_cap
    else:
        live_overflow = jnp.zeros((), jnp.int32)
        if sat_depth is not None:
            # cull without compaction (probe mode: measures num_live /
            # culled num_pairs so callers can size live_cap + pair caps)
            alive = live
            bw = jnp.where(alive, x1 - x0 + 1, 0)
            bh = jnp.where(alive, y1 - y0 + 1, 0)
            count = bw * bh
        gids = jnp.arange(g, dtype=jnp.int32)
        n_rows = g

    # (n_rows, mt) slot enumeration: row-major over the bbox
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

    gid_payload = jnp.where(valid, gids[:, None], g).reshape(-1)

    # is_stable=False: lax.sort is stable by default, which makes XLA carry
    # a hidden iota payload through the sort (third 800k array, +~0.3 ms).
    # Pairs with identical (tile, quantized depth) keys compose in
    # arbitrary order either way — their contributions are near-equal by
    # construction.
    key_s, gid_s = jax.lax.sort(
        (key, gid_payload), num_keys=1, is_stable=False
    )

    probes = (
        jnp.arange(num_tiles + 1, dtype=jnp.uint32) << jnp.uint32(depth_bits)
    )
    starts = jnp.searchsorted(key_s, probes).astype(jnp.int32)
    num_pairs = starts[num_tiles]
    tile_counts = jnp.diff(starts)

    if pair_capacity_blocks is None:
        pair_capacity_blocks = (n_rows * mt + chunk - 1) // chunk
    cap = pair_capacity_blocks * chunk

    sorted_gid = gid_s[:cap]
    if cap > n_rows * mt:
        sorted_gid = jnp.pad(
            sorted_gid, (0, cap - n_rows * mt), constant_values=g
        )

    overflow_cap = jnp.maximum(num_pairs - cap, 0).astype(jnp.int32)
    return TileBinning(
        sorted_gid=sorted_gid,
        starts=starts,
        tile_counts=tile_counts,
        num_pairs=num_pairs,
        overflow=overflow,
        overflow_cap=overflow_cap,
        num_live=num_live,
        live_overflow=live_overflow,
    )
