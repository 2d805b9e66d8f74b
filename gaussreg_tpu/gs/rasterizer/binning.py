"""Tile binning: (gaussian, tile) pair lists sorted by (tile, depth).

TPU-native equivalent of CUDA 3DGS's duplicate-and-radix-sort binning, built
from XLA sorts with static capacities: every gaussian contributes up to
MAX_TILES_PER_GAUSSIAN pairs (its screen bbox clipped to that budget;
overflow is counted, never silently dropped pixels-first), pairs are sorted
by a (tile, depth-rank) key, and per-tile ranges come from searchsorted.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBinning(NamedTuple):
    """Sorted, per-tile-aligned pair lists.

    Every tile's segment [tile_offsets[t], tile_offsets[t+1]) is padded to a
    multiple of `align` pairs, so the Pallas kernels' chunked DMAs are always
    tiling-aligned and tiles never share a chunk. Padding slots have
    pair_valid == False (and gaussian index 0)."""

    pair_gaussian: jnp.ndarray  # (P_aligned,) int32 gaussian index per pair
    pair_valid: jnp.ndarray  # (P_aligned,) bool
    pair_positions: jnp.ndarray  # (G, mt) int32 position of each gaussian's
    # pairs in the aligned array (== P_aligned for unused slots) — lets the
    # pair-gather VJP be a gather+reduce instead of a scatter-add
    tile_offsets: jnp.ndarray  # (num_tiles + 1,) int32, align-multiples
    tile_counts: jnp.ndarray  # (num_tiles,) int32 true (unpadded) counts
    num_pairs: jnp.ndarray  # () int32 — true pair count
    overflow: jnp.ndarray  # () int32 — pairs dropped by the per-gaussian cap


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_w",
        "tile_h",
        "width",
        "height",
        "max_tiles_per_gaussian",
        "align",
    ),
)
def bin_gaussians(
    means2d: jnp.ndarray,  # (G, 2)
    radii: jnp.ndarray,  # (G,) 0 = culled
    depths: jnp.ndarray,  # (G,)
    width: int,
    height: int,
    tile_w: int = 128,
    tile_h: int = 16,
    max_tiles_per_gaussian: int = 16,
    align: int = 256,
) -> TileBinning:
    g = means2d.shape[0]
    ntx = (width + tile_w - 1) // tile_w
    nty = (height + tile_h - 1) // tile_h
    num_tiles = ntx * nty
    mt = max_tiles_per_gaussian

    x, y = means2d[:, 0], means2d[:, 1]
    r = radii
    # clip to the tile grid but keep emptiness: fully off-screen bboxes must
    # yield zero tiles, not a clamped border tile
    tx0 = jnp.maximum(jnp.floor((x - r) / tile_w), 0).astype(jnp.int32)
    tx1 = jnp.minimum(jnp.floor((x + r) / tile_w), ntx - 1).astype(jnp.int32)
    ty0 = jnp.maximum(jnp.floor((y - r) / tile_h), 0).astype(jnp.int32)
    ty1 = jnp.minimum(jnp.floor((y + r) / tile_h), nty - 1).astype(jnp.int32)
    alive = r > 0.0
    bw = jnp.where(alive, jnp.maximum(tx1 - tx0 + 1, 0), 0)
    bh = jnp.where(alive, jnp.maximum(ty1 - ty0 + 1, 0), 0)
    count = bw * bh  # (G,)
    tx0 = jnp.clip(tx0, 0, ntx - 1)
    ty0 = jnp.clip(ty0, 0, nty - 1)

    # --- sort-free counting binning -------------------------------------
    # The only sort is a single depth argsort of the G gaussians. Working in
    # depth order, the per-tile rank of a gaussian is the count of earlier
    # (closer) gaussians touching the same tile — an exclusive cumsum of the
    # (G, num_tiles) touch matrix. This replaces the O(G * mt) pair sort
    # (the former dominant binning cost) with elementwise work + one cumsum.
    depth_order = jnp.argsort(depths).astype(jnp.int32)  # (G,)
    tx0s = tx0[depth_order]
    ty0s = ty0[depth_order]
    bws = bw[depth_order]
    bhs = bh[depth_order]
    counts_s = count[depth_order]

    tile_x = jnp.arange(num_tiles, dtype=jnp.int32) % ntx  # (T,)
    tile_y = jnp.arange(num_tiles, dtype=jnp.int32) // ntx
    # slot index of tile t within gaussian g's row-major bbox enumeration;
    # the per-gaussian cap (first mt bbox tiles) is part of the predicate,
    # keeping `touch` exactly consistent with the (G, mt) slots below
    slot_of_t = (tile_y[None, :] - ty0s[:, None]) * bws[:, None] + (
        tile_x[None, :] - tx0s[:, None]
    )
    touch = (
        (tile_x[None, :] >= tx0s[:, None])
        & (tile_x[None, :] < tx0s[:, None] + bws[:, None])
        & (tile_y[None, :] >= ty0s[:, None])
        & (tile_y[None, :] < ty0s[:, None] + bhs[:, None])
        & (slot_of_t < mt)
    )  # (G, T) in depth order
    slot = jnp.arange(mt, dtype=jnp.int32)
    dy = slot[None, :] // jnp.maximum(bws, 1)[:, None]
    dx = slot[None, :] % jnp.maximum(bws, 1)[:, None]
    in_bbox = slot[None, :] < jnp.minimum(counts_s, mt)[:, None]
    tile_id_s = (ty0s[:, None] + dy) * ntx + (tx0s[:, None] + dx)  # (G, mt)
    tile_id_s = jnp.where(in_bbox, tile_id_s, 0)

    touch_i = touch.astype(jnp.int32)
    incl = jnp.cumsum(touch_i, axis=0)  # (G, T)
    rank = incl - touch_i  # exclusive
    tile_counts = incl[-1]  # (T,)

    padded_counts = ((tile_counts + align - 1) // align) * align
    tile_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts, dtype=jnp.int32)]
    )
    cap = g * mt + num_tiles * align  # static upper bound on aligned length

    ranks_gs = jnp.take_along_axis(rank, tile_id_s, axis=1)  # (G, mt)
    base = tile_offsets[tile_id_s]
    pos = jnp.where(in_bbox, base + ranks_gs, cap)  # (G, mt) in depth order

    gid_s = depth_order  # sorted row -> original gaussian id
    pair_gaussian = (
        jnp.zeros(cap + 1, jnp.int32)
        .at[pos.reshape(-1)]
        .set(jnp.broadcast_to(gid_s[:, None], (g, mt)).reshape(-1))[:cap]
    )
    pair_valid = (
        jnp.zeros(cap + 1, jnp.bool_)
        .at[pos.reshape(-1)]
        .set(in_bbox.reshape(-1))[:cap]
    )
    # inverse map: original (gaussian, slot) -> aligned position
    pair_positions = (
        jnp.zeros((g, mt), jnp.int32).at[depth_order].set(pos)
    )

    overflow = jnp.sum(jnp.maximum(count - mt, 0))
    return TileBinning(
        pair_gaussian=pair_gaussian,
        pair_valid=pair_valid,
        pair_positions=pair_positions,
        tile_offsets=tile_offsets,
        tile_counts=tile_counts,
        num_pairs=jnp.sum(jnp.minimum(count, mt)).astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
    )
