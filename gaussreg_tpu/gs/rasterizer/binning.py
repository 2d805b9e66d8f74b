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

    slot = jnp.arange(mt, dtype=jnp.int32)  # (mt,)
    dy = slot[None, :] // jnp.maximum(bw, 1)[:, None]
    dx = slot[None, :] % jnp.maximum(bw, 1)[:, None]
    in_bbox = slot[None, :] < jnp.minimum(count, mt)[:, None]
    tile_id = (ty0[:, None] + dy) * ntx + (tx0[:, None] + dx)  # (G, mt)
    tile_id = jnp.where(in_bbox, tile_id, num_tiles)  # invalid sort last

    # sort pairs by (tile, depth) with ONE sort on a composite int32 key:
    # tile * G + depth_rank(gaussian). Requires num_tiles * G < 2^31 (holds
    # for any realistic scene/image; guarded at trace time).
    assert (num_tiles + 1) * g < 2**31 - 1, (num_tiles, g)
    depth_order = jnp.argsort(depths)  # (G,) one small sort
    depth_rank = (
        jnp.zeros(g, jnp.int32)
        .at[depth_order]
        .set(jnp.arange(g, dtype=jnp.int32))
    )
    pair_gid = jnp.broadcast_to(
        jnp.arange(g, dtype=jnp.int32)[:, None], (g, mt)
    ).reshape(-1)
    pair_key = tile_id.reshape(-1) * g + depth_rank[pair_gid]

    orig_idx = jnp.arange(g * mt, dtype=jnp.int32)
    sorted_keys, sorted_orig = jax.lax.sort((pair_key, orig_idx), num_keys=1)
    sorted_gid = pair_gid[sorted_orig]
    sorted_valid = sorted_keys < num_tiles * g

    raw_offsets = jnp.searchsorted(
        sorted_keys,
        jnp.arange(num_tiles + 1, dtype=jnp.int32) * g,
        side="left",
    ).astype(jnp.int32)
    tile_counts = raw_offsets[1:] - raw_offsets[:-1]
    sorted_tiles = jnp.minimum(sorted_keys // g, num_tiles)

    # re-layout so every tile's segment starts/ends on an `align` boundary
    padded_counts = ((tile_counts + align - 1) // align) * align
    tile_offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts, dtype=jnp.int32)]
    )
    cap = g * mt + num_tiles * align  # static upper bound on aligned length
    p = sorted_tiles.shape[0]
    rank = jnp.arange(p, dtype=jnp.int32) - raw_offsets[
        jnp.minimum(sorted_tiles, num_tiles)
    ]
    new_pos = jnp.where(
        sorted_valid, tile_offsets[jnp.minimum(sorted_tiles, num_tiles)] + rank, cap
    )
    pair_gaussian = (
        jnp.zeros(cap + 1, jnp.int32).at[new_pos].set(sorted_gid)[:cap]
    )
    pair_valid = (
        jnp.zeros(cap + 1, jnp.bool_).at[new_pos].set(sorted_valid)[:cap]
    )
    # inverse map: original (gaussian, slot) -> aligned position (cap if
    # unused); int32 scatter-set, 128x cheaper than a float row scatter-add
    pair_positions = (
        jnp.full(g * mt, cap, jnp.int32)
        .at[sorted_orig]
        .set(jnp.where(sorted_valid, new_pos, cap))
        .reshape(g, mt)
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
