"""Tile binning: channel-major (gaussian, tile) pair id blocks sorted by
(tile, depth).

TPU-native equivalent of CUDA 3DGS's duplicate-and-radix-sort binning. The
only sort is a single G-element depth argsort. Per-tile depth ranks — the
count of closer gaussians touching the same tile — are computed by a Pallas
kernel that streams depth-ordered gaussian blocks, builds each block's
(Kb, T) tile-touch matrix on the fly, turns the running count into ranks
with a strictly-lower-triangular MXU matmul (bf16 0/1 inputs, f32
accumulation — exact), and extracts the rank at each gaussian's <= mt bbox
tiles. One XLA scatter then places gaussian ids at their aligned pair
positions. Every capacity (per-gaussian tile budget mt, total pair capacity)
is static, with overflow counted — never silently dropped (SURVEY.md §7.3).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class TileBinning(NamedTuple):
    """Per-tile-aligned pair id blocks.

    Every tile's segment occupies whole (NCHAN, chunk) blocks
    [tile_offsets_blk[t], tile_offsets_blk[t+1]), so the Pallas rasterizer's
    chunked DMAs are tiling-aligned and tiles never share a block. Padding
    slots hold the sentinel id G (an all-zero data row downstream)."""

    pair_ids: jnp.ndarray  # (nblk, chunk) int32 gaussian id per pair (G = pad)
    tile_offsets_blk: jnp.ndarray  # (num_tiles + 1,) int32 in block units
    tile_counts: jnp.ndarray  # (num_tiles,) int32 true (unpadded) counts
    gblock_lo: jnp.ndarray  # (n_gblocks,) int32 first pair-block whose pairs
    # touch this gaussian block (for the gradient accumulation kernel)
    gblock_hi: jnp.ndarray  # (n_gblocks,) int32 one-past-last pair-block
    num_pairs: jnp.ndarray  # () int32 — true pair count
    overflow: jnp.ndarray  # () int32 — pairs dropped by the per-gaussian cap
    overflow_cap: jnp.ndarray  # () int32 — pairs dropped by pair capacity


def _rank_kernel(kb: int, t_tiles: int, ntx: int, mt: int, nb: int):
    def kernel(geom_ref, tid_ref, rank_ref, counts_ref, carry):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            carry[...] = jnp.zeros((1, t_tiles), jnp.float32)

        geom = geom_ref[...].astype(jnp.float32)  # (Kb, 8)
        # column extraction via basis matmuls (lane slicing at arbitrary
        # offsets is not supported by Mosaic)
        def col(c):
            e = (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == c).astype(
                jnp.float32
            )
            return jax.lax.dot_general(
                geom, e, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Kb, 1)

        tx0 = col(0)
        ty0 = col(1)
        bw = col(2)
        bh = col(3)

        tl = jax.lax.broadcasted_iota(jnp.int32, (1, t_tiles), 1)
        tx = (tl % ntx).astype(jnp.float32)  # (1, T)
        ty = (tl // ntx).astype(jnp.float32)
        inx = (tx >= tx0) & (tx < tx0 + bw)
        iny = (ty >= ty0) & (ty < ty0 + bh)
        slot_of_t = (ty - ty0) * bw + (tx - tx0)
        touch = (inx & iny & (slot_of_t < mt)).astype(jnp.float32)  # (Kb, T)

        r = jax.lax.broadcasted_iota(jnp.int32, (kb, kb), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (kb, kb), 1)
        tri = (r > c).astype(jnp.bfloat16)
        within = jax.lax.dot_general(
            tri, touch.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Kb, T) exact: 0/1 inputs, f32 accumulation
        rank = within + carry[...]

        tidf = tid_ref[...].astype(jnp.float32)  # (Kb, mt)
        rank_sel = jnp.zeros((kb, mt), jnp.float32)
        for s in range(mt):
            es = (jax.lax.broadcasted_iota(jnp.int32, (mt, 1), 0) == s).astype(
                jnp.float32
            )
            tid_s = jax.lax.dot_general(
                tidf, es, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Kb, 1)
            oh = (tl.astype(jnp.float32) == tid_s).astype(jnp.float32)
            sel = jnp.sum(rank * oh, axis=1, keepdims=True)  # (Kb, 1)
            rank_sel = rank_sel + sel * (
                jax.lax.broadcasted_iota(jnp.int32, (1, mt), 1) == s
            ).astype(jnp.float32)

        rank_ref[...] = rank_sel
        carry[...] = carry[...] + jax.lax.dot_general(
            jnp.ones((1, kb), jnp.bfloat16), touch.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(b == nb - 1)
        def _():
            counts_ref[...] = carry[...]

    return kernel


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
        "gblock",
    ),
)
def bin_gaussians(
    means2d: jnp.ndarray,  # (G, 2)
    radii: jnp.ndarray,  # (G,) 0 = culled
    depths: jnp.ndarray,  # (G,)
    width: int,
    height: int,
    tile_w: int = 32,
    tile_h: int = 16,
    max_tiles_per_gaussian: int = 16,
    chunk: int = 128,
    pair_capacity_blocks: int | None = None,
    gblock: int = 256,
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

    # depth order: working in depth order, a gaussian's per-tile rank is the
    # number of closer gaussians touching the same tile
    depth_order = jnp.argsort(depths).astype(jnp.int32)  # (G,)
    kb = 256
    g_pad = ((g + kb - 1) // kb) * kb
    pad = g_pad - g

    def by_depth(v, fill):
        s = v[depth_order]
        return jnp.pad(s, (0, pad), constant_values=fill)

    tx0s = by_depth(tx0, 0)
    ty0s = by_depth(ty0, 0)
    bws = by_depth(bw, 0)  # bw == 0 -> touches nothing
    bhs = by_depth(bh, 0)
    counts_s = by_depth(count, 0)
    gid_s = jnp.pad(depth_order, (0, pad), constant_values=g)

    # per-slot tile ids (depth order), sentinel num_tiles for unused slots
    slot = jnp.arange(mt, dtype=jnp.int32)
    dy = slot[None, :] // jnp.maximum(bws, 1)[:, None]
    dx = slot[None, :] % jnp.maximum(bws, 1)[:, None]
    in_bbox = slot[None, :] < jnp.minimum(counts_s, mt)[:, None]
    tid_s = (ty0s[:, None] + dy) * ntx + (tx0s[:, None] + dx)  # (Gp, mt)
    tid_s = jnp.where(in_bbox, tid_s, num_tiles)

    geom = jnp.stack(
        [tx0s, ty0s, bws, bhs, *([jnp.zeros_like(tx0s)] * 4)], axis=1
    )  # (Gp, 8) int32

    nb = g_pad // kb
    rank_f, counts_f = pl.pallas_call(
        _rank_kernel(kb, num_tiles, ntx, mt, nb),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((kb, 8), lambda b: (b, 0)),
            pl.BlockSpec((kb, mt), lambda b: (b, 0)),
        ],
        out_specs=[
            pl.BlockSpec((kb, mt), lambda b: (b, 0)),
            pl.BlockSpec((1, num_tiles), lambda b: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g_pad, mt), jnp.float32),
            jax.ShapeDtypeStruct((1, num_tiles), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, num_tiles), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(geom, tid_s)
    tile_counts = counts_f[0].astype(jnp.int32)  # (T,)
    ranks = rank_f.astype(jnp.int32)  # (Gp, mt) depth order

    blocks_per_tile = (tile_counts + chunk - 1) // chunk
    tile_offsets_blk = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(blocks_per_tile, dtype=jnp.int32)]
    )
    if pair_capacity_blocks is None:
        pair_capacity_blocks = (g * mt + chunk - 1) // chunk + num_tiles
    nblk = pair_capacity_blocks
    cap = nblk * chunk

    base_blk = tile_offsets_blk[jnp.minimum(tid_s, num_tiles)]  # (Gp, mt)
    pos = base_blk * chunk + ranks
    pos = jnp.where(in_bbox, pos, cap + chunk)  # dropped by mode="drop"

    pair_ids = (
        jnp.full(cap, g, jnp.int32)
        .at[pos.reshape(-1)]
        .set(
            jnp.broadcast_to(gid_s[:, None], (g_pad, mt)).reshape(-1),
            mode="drop",
            unique_indices=True,
        )
    ).reshape(nblk, chunk)

    # per-gaussian-block pair-block ranges for the gradient accumulator:
    # segment min/max keyed by (tile-order gaussian id // gblock)
    pos_blk = pos // chunk
    row_lo = jnp.min(jnp.where(in_bbox, pos_blk, jnp.int32(2**30)), axis=1)
    row_hi = jnp.max(jnp.where(in_bbox, pos_blk, jnp.int32(-1)), axis=1)
    n_gblocks = (g + gblock - 1) // gblock
    seg = jnp.minimum(gid_s // gblock, n_gblocks - 1)
    gblock_lo = jax.ops.segment_min(row_lo, seg, num_segments=n_gblocks)
    gblock_hi = jax.ops.segment_max(row_hi, seg, num_segments=n_gblocks)
    gblock_lo = jnp.clip(jnp.minimum(gblock_lo, gblock_hi + 1), 0, nblk)
    gblock_hi = jnp.clip(gblock_hi + 1, 0, nblk)

    num_pairs = jnp.sum(jnp.minimum(count, mt)).astype(jnp.int32)
    overflow = jnp.sum(jnp.maximum(count - mt, 0)).astype(jnp.int32)
    in_cap = jnp.sum((pos < cap) & in_bbox).astype(jnp.int32)
    return TileBinning(
        pair_ids=pair_ids,
        tile_offsets_blk=tile_offsets_blk,
        tile_counts=tile_counts,
        gblock_lo=gblock_lo,
        gblock_hi=gblock_hi,
        num_pairs=num_pairs,
        overflow=overflow,
        overflow_cap=num_pairs - in_cap,
    )
