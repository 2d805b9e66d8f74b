"""Pallas TPU kernels: tile-based gaussian alpha compositing, forward +
analytic backward — fully vectorized (no per-gaussian scalar loop).

Key ideas (TPU-native; see SURVEY.md §7.2 step 6):

- each gaussian's log-density is a quadratic form in pixel coords, so the
  (K, NPIX) exponent matrix is ONE MXU matmul: coeffs (8, K) contracted with
  phi (8, NPIX) where phi = [1, x, y, x^2, xy, y^2, 0, 0]. Opacity is folded
  into the constant coefficient as log(opacity), so alpha = exp(min(power,0))
  clamped — one channel and one gradient path fewer;
- the front-to-back compositing recurrence T_j = prod_{i<j}(1 - a_i) becomes
  a log-space *prefix sum*, computed as a strictly-lower-triangular (K, K)
  matmul on the MXU — the only sequential dependency left is one (1, NPIX)
  carry per chunk;
- pair data lives in HBM CHANNEL-MAJOR as (num_blocks, 16, CHUNK) f32 blocks
  built by one XLA row-gather from the (G, 16) per-gaussian table at the
  depth-sorted pair ids (binning.py). With only ~12 live channels, a
  pair-major (P, 128) layout would waste 8x HBM capacity and bandwidth (TPU
  pads the minor dim to 128 lanes); the channel-major layout is dense, and
  every kernel matmul consumes it directly (contracting the 8-sublane or
  4-sublane channel axis) with no in-kernel transposes;
- the pair layout is UNALIGNED: tile t's pairs occupy sorted elements
  [starts[t], starts[t+1]) and a boundary block can be shared by two tiles.
  The kernels row-mask foreign rows (masked alpha = 0 composites to a
  no-op), so no realignment gather/scatter is ever needed (binning.py).

The backward runs in forward order (prefix recomputation): suffix color
inner products come from <d, S_j> = <d, final_rgb> - <d, prefix_j>.

SATURATION COMPACTION: the forward kernel early-terminates each tile once
every pixel's transmittance drops below T_EPS and reports the number of
chunks it actually composited (`kend`, one int per tile). Only those blocks
carry gradient — the function being differentiated never read the rest. The
backward therefore re-walks a COMPACTED block list: tile t's kept input
blocks are gathered to the contiguous range [offs[t], offs[t+1]) where
offs = cumsum(kend), and per-pair gradient blocks are written back to the
same compacted range — private per tile BY CONSTRUCTION (boundary blocks
shared by two tiles in the sorted layout are duplicated per tile), so the
writes are atomics-free with zero slack. On saturated scenes this shrinks
the gradient row count far below the full pair capacity (measured 1949 of
12500 blocks on the bench scene), which flips the optimal accumulation
strategy: a direct SCATTER-ADD of the compacted rows keyed by gaussian id
(gid = sorted_gid[original pair position], ~15 ns/row) beats the round-1
position-table row-gather (whose row count is the full G*mt table and
whose source-size cost is capacity-bound). Foreign rows in duplicated
boundary blocks and dead rows are exact zeros from the kernel's rowmask,
so they add harmlessly; rows past the compacted end scatter to the
sentinel row. The chain from the quadratic coefficients back to
means2d/conics/opacity is ordinary autodiff outside the kernel.

`bwd_capacity_blocks` statically caps the compacted buffer AND the
scatter row count. The default (num_blocks + num_tiles) can never
overflow; callers that render saturated scenes repeatedly (fine
registration, bench) should size it from the `sat_blocks` forward output
— tighter caps make the backward proportionally cheaper, and pairs beyond
the cap lose their gradient and are counted there, never silently
dropped.

Pair channel layout (16 sublanes per block):
  0..5: quadratic coeffs [a0 + log(op), ax, ay, axx, axy, ayy]
  6..7: zero (phi rows 6, 7 are zero, so these never contribute)
  8..11: r, g, b, depth
  12..15: zero padding
(depth is composited exactly like a color channel, yielding alpha-weighted
expected depth.)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4  # chunk-level early termination: once every pixel of the tile
# has transmittance below this, remaining chunks are skipped — in BOTH
# passes (the backward also walks forward, recomputing the identical
# T sequence), so fwd/bwd stay exactly consistent
CHUNK = 128  # gaussians per chunk == lane width of a pair block
NCHAN = 16  # channel sublanes per pair block


def _phi_and_masks(t, ntx, tile_h, tile_w):
    """phi (8, NPIX) quadratic basis at this tile's pixel centers."""
    npix = tile_h * tile_w
    ty = (t // ntx).astype(jnp.float32)
    tx = (t % ntx).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    x = (lane % tile_w).astype(jnp.float32) + tx * tile_w + 0.5
    y = (lane // tile_w).astype(jnp.float32) + ty * tile_h + 0.5
    one = jnp.ones((1, npix), jnp.float32)
    zero = jnp.zeros((1, npix), jnp.float32)
    phi = jnp.concatenate([one, x, y, x * x, x * y, y * y, zero, zero], axis=0)
    return phi


def _tri_matrices(chunk):
    """Strict and inclusive lower-triangular (chunk, chunk) f32 constants."""
    r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    strict = (r > c).astype(jnp.float32)
    incl = (r >= c).astype(jnp.float32)
    return strict, incl


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _chunk_alpha(coeffs, phi, rowmask):
    """alpha for one channel-major chunk. coeffs (NCHAN, K); returns
    (alpha, raw) each (K, NPIX)."""
    power = _dot(coeffs[0:8], phi, (((0,), (0,))))  # (K, NPIX)
    raw = jnp.exp(jnp.minimum(power, 0.0))
    alpha = jnp.where(raw < ALPHA_MIN, 0.0, jnp.minimum(raw, ALPHA_MAX))
    alpha = alpha * rowmask
    return alpha, raw


def _segment(starts_ref, t, chunk_n, cap):
    """Clamped element range + block walk for tile t."""
    c0 = jnp.minimum(starts_ref[t], cap)
    c1 = jnp.minimum(starts_ref[t + 1], cap)
    n = c1 - c0
    start_blk = jax.lax.div(c0, chunk_n)
    num_chunks = jnp.where(
        n > 0, jax.lax.div(c1 - 1, chunk_n) - start_blk + 1, 0
    )
    return c0, c1, start_blk, num_chunks


def _forward_kernel(ntx: int, tile_h: int, tile_w: int, chunk_n: int, nblk: int):
    npix = tile_h * tile_w
    cap = nblk * chunk_n

    def kernel(starts_ref, pair_ref, out_ref, chunk, sem, rgb_acc, t_row):
        # rgb_acc rows: 0..3 = r, g, b, depth accumulators; row 4 = final T.
        # out row 5 broadcasts the tile's saturation chunk count (kend) —
        # TPU lowering rejects a separate (1, 1)-blocked int output, so it
        # rides the image tile as a float row and is sliced off outside.
        t = pl.program_id(0)
        c0, c1, start_blk, num_chunks = _segment(starts_ref, t, chunk_n, cap)

        phi = _phi_and_masks(t, ntx, tile_h, tile_w)
        l_strict, _ = _tri_matrices(chunk_n)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (chunk_n, 1), 0)

        rgb_acc[...] = jnp.zeros((5, npix), jnp.float32)
        t_row[...] = jnp.ones((1, npix), jnp.float32)

        def get_dma(slot, k):
            return pltpu.make_async_copy(
                pair_ref.at[start_blk + k],
                chunk.at[slot],
                sem.at[slot],
            )

        @pl.when(num_chunks > 0)
        def _():
            get_dma(0, 0).start()

        def chunk_body(k, _):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < num_chunks)
            def _():
                get_dma(jax.lax.rem(k + 1, 2), k + 1).start()

            get_dma(slot, k).wait()
            coeffs = chunk[slot]  # (NCHAN, K) channel-major
            gpos = (start_blk + k) * chunk_n + row_ids  # global element ids
            rowmask = ((gpos >= c0) & (gpos < c1)).astype(jnp.float32)
            alpha, _ = _chunk_alpha(coeffs, phi, rowmask)

            lg = jnp.log1p(-alpha)
            cum = _dot(l_strict, lg, (((1,), (0,))))  # exclusive prefix
            tj = t_row[...] * jnp.exp(cum)  # (K, NPIX)
            w = alpha * tj
            colors = coeffs[8:12]  # (4, K): r, g, b, depth
            rgb_acc[0:4] = rgb_acc[0:4] + _dot(colors, w, (((1,), (0,))))
            new_t = t_row[...] * jnp.exp(
                cum[chunk_n - 1 : chunk_n, :] + lg[chunk_n - 1 : chunk_n, :]
            )
            t_row[...] = new_t
            return jnp.max(new_t)

        def cond(carry):
            k, tmax = carry
            return (k < num_chunks) & (tmax >= T_EPS)

        def body(carry):
            k, _ = carry
            tmax = chunk_body(k, None)
            return k + 1, tmax

        k_end, _ = jax.lax.while_loop(cond, body, (0, jnp.float32(1.0)))

        # drain the prefetch issued for the chunk after an early exit
        @pl.when(k_end < num_chunks)
        def _():
            get_dma(jax.lax.rem(k_end, 2), k_end).wait()

        rgb_acc[4:5] = t_row[...]
        out_ref[0, 0:5] = rgb_acc[...]
        # chunks composited before saturation: the backward re-walks exactly
        # these (module docstring, SATURATION COMPACTION)
        out_ref[0, 5:6] = jnp.full((1, npix), k_end, jnp.float32)

    return kernel


def _backward_kernel(ntx: int, tile_h: int, tile_w: int, chunk_n: int, orig_nblk: int):
    npix = tile_h * tile_w
    cap = orig_nblk * chunk_n  # ORIGINAL sorted-layout element capacity:
    # c0/c1/gpos index the uncompacted pair order for row masking

    def kernel(
        starts_ref, offs_ref, blksrc_ref, pair_ref, ct_ref, grad_out_ref,
        chunk, gchunk, sem, gsem, t_row, vp_row,
    ):
        # ct_ref block: (1, 7, NPIX) = [d_r, d_g, d_b, d_depth, d_T,
        # T_final, v] with v = sum over the 4 color channels of
        # d_ch * final_ch. INPUT blocks stay in the original sorted layout
        # (pair_ref) and are fetched through the compacted->original map
        # blksrc_ref — an XLA pre-gather of the kept blocks measured
        # 1.8 ms at 2k x 8 KB rows (byte-bound bad lowering, PERF.md r4);
        # the in-kernel DMA costs nothing extra. Gradient blocks are
        # WRITTEN to the compacted layout: tile t owns [offs_ref[t],
        # offs_ref[t + 1]) exclusively (module docstring).
        t = pl.program_id(0)
        c0, c1, start_blk, _ = _segment(starts_ref, t, chunk_n, cap)
        base = offs_ref[t]
        num_chunks = offs_ref[t + 1] - base

        phi = _phi_and_masks(t, ntx, tile_h, tile_w)
        l_strict, l_incl = _tri_matrices(chunk_n)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (chunk_n, 1), 0)

        d_rgb = ct_ref[0, 0:4]  # (4, NPIX): r, g, b, depth cotangents
        d_t_final = ct_ref[0, 4:5]  # (1, NPIX)
        t_final = ct_ref[0, 5:6]
        v = ct_ref[0, 6:7]

        t_row[...] = jnp.ones((1, npix), jnp.float32)
        vp_row[...] = jnp.zeros((1, npix), jnp.float32)  # <d, prefix so far>

        def in_dma(slot, k):
            return pltpu.make_async_copy(
                pair_ref.at[blksrc_ref[base + k]], chunk.at[slot], sem.at[slot]
            )

        def out_dma(slot, k):
            return pltpu.make_async_copy(
                gchunk.at[slot],
                grad_out_ref.at[base + k],
                gsem.at[slot],
            )

        @pl.when(num_chunks > 0)
        def _():
            in_dma(0, 0).start()

        def chunk_body(k, _):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < num_chunks)
            def _():
                in_dma(jax.lax.rem(k + 1, 2), k + 1).start()

            in_dma(slot, k).wait()

            # the gradient write into this slot two chunks ago must land
            # before we overwrite the buffer
            @pl.when(k >= 2)
            def _():
                out_dma(slot, k - 2).wait()

            coeffs = chunk[slot]  # (NCHAN, K)
            gpos = (start_blk + k) * chunk_n + row_ids
            rowmask = ((gpos >= c0) & (gpos < c1)).astype(jnp.float32)
            alpha, raw = _chunk_alpha(coeffs, phi, rowmask)
            colors = coeffs[8:12]  # (4, K): r, g, b, depth

            lg = jnp.log1p(-alpha)
            cum = _dot(l_strict, lg, (((1,), (0,))))
            tj = t_row[...] * jnp.exp(cum)
            w = alpha * tj
            one_m = 1.0 - alpha

            e = _dot(colors, d_rgb, (((0,), (0,))))  # (K, NPIX)
            ew = e * w
            u = vp_row[...] + _dot(l_incl, ew, (((1,), (0,))))  # <d, P_j>
            d_alpha = (
                e * tj
                - (v - u) / one_m
                - d_t_final * t_final / one_m
            )
            active = ((raw >= ALPHA_MIN) & (raw <= ALPHA_MAX)).astype(jnp.float32)
            # d raw / d power = raw in the active band (alpha == raw there)
            d_power = d_alpha * raw * active * rowmask

            d_colors = _dot(d_rgb, w, (((1,), (1,))))  # (4, K)
            d_coef = _dot(phi, d_power, (((1,), (1,))))  # (8, K)
            gchunk[slot, 0:8] = d_coef
            gchunk[slot, 8:12] = d_colors
            gchunk[slot, 12:16] = jnp.zeros((4, chunk_n), jnp.float32)
            out_dma(slot, k).start()

            # carries
            new_t = t_row[...] * jnp.exp(
                cum[chunk_n - 1 : chunk_n, :] + lg[chunk_n - 1 : chunk_n, :]
            )
            t_row[...] = new_t
            vp_row[...] = vp_row[...] + _dot(
                jnp.ones((1, chunk_n), jnp.float32), ew, (((1,), (0,)))
            )
            return jnp.max(new_t)

        def body(k, carry):
            chunk_body(k, None)
            return carry

        # no early-exit condition: num_chunks IS the forward's saturation
        # count, so every iteration carries gradient
        jax.lax.fori_loop(0, num_chunks, body, 0)

        # drain outstanding gradient writes
        @pl.when(num_chunks >= 1)
        def _():
            out_dma(jax.lax.rem(num_chunks - 1, 2), num_chunks - 1).wait()

        @pl.when(num_chunks >= 2)
        def _():
            out_dma(jax.lax.rem(num_chunks - 2, 2), num_chunks - 2).wait()

    return kernel


def _tiles_to_image(per_tile, nty, ntx, tile_h, tile_w, c):
    """(num_tiles, c, tile_h*tile_w) -> (c, H, W) outside the kernel."""
    x = per_tile.reshape(nty, ntx, c, tile_h, tile_w)
    return x.transpose(2, 0, 3, 1, 4).reshape(c, nty * tile_h, ntx * tile_w)


def _image_to_tiles(planes, nty, ntx, tile_h, tile_w):
    """(c, H, W) -> (num_tiles, c, tile_h*tile_w)."""
    c = planes.shape[0]
    x = planes.reshape(c, nty, tile_h, ntx, tile_w)
    return x.transpose(1, 3, 0, 2, 4).reshape(nty * ntx, c, tile_h * tile_w)


def _build_pair_blocks(gdata, sorted_gid):
    """(cap,) ids -> (cap/CHUNK, NCHAN, CHUNK) channel-major blocks.

    gdata is (G + 1, NCHAN) with a sentinel row at index G whose a0 = -1e30
    (alpha == 0), so invalid/padding pair slots are no-ops downstream."""
    cap = sorted_gid.shape[0]
    rows = gdata[sorted_gid]  # (cap, NCHAN)
    return rows.reshape(cap // CHUNK, CHUNK, NCHAN).transpose(0, 2, 1)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "tile_h", "tile_w")
)
def _rasterize_fwd_impl(
    pair_blocks, starts, height, width, tile_h, tile_w
):
    chunk_n = pair_blocks.shape[2]
    nblk = pair_blocks.shape[0]
    ntx = width // tile_w
    nty = height // tile_h
    num_tiles = ntx * nty
    npix = tile_h * tile_w
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 6, npix), lambda t, starts: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, NCHAN, chunk_n), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((5, npix), jnp.float32),
            pltpu.VMEM((1, npix), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        _forward_kernel(ntx, tile_h, tile_w, chunk_n, nblk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 6, npix), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(starts, pair_blocks)
    kend = out[:, 5, 0].astype(jnp.int32)
    return _tiles_to_image(out[:, :5], nty, ntx, tile_h, tile_w, 5), kend


@functools.partial(
    jax.jit,
    static_argnames=("bwd_blocks", "height", "width", "tile_h", "tile_w"),
)
def _rasterize_bwd_impl(
    pair_blocks, starts, offs, blk_src, ct_planes, bwd_blocks, height, width,
    tile_h, tile_w,
):
    """Backward over the saturation-compacted block list: tile t's kept
    blocks are read straight from the ORIGINAL sorted layout through
    `blk_src` (compacted index -> original block id, scalar-prefetched so
    the kernel's own DMA does the compaction); gradient output blocks are
    written to [offs[t], offs[t + 1]) of the (bwd_blocks, ...) buffer."""
    chunk_n = pair_blocks.shape[2]
    orig_nblk = pair_blocks.shape[0]
    ntx = width // tile_w
    nty = height // tile_h
    num_tiles = ntx * nty
    npix = tile_h * tile_w
    ct_tiles = _image_to_tiles(ct_planes, nty, ntx, tile_h, tile_w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 7, npix), lambda t, starts, offs, blk_src: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, NCHAN, chunk_n), jnp.float32),
            pltpu.VMEM((2, NCHAN, chunk_n), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, npix), jnp.float32),
            pltpu.VMEM((1, npix), jnp.float32),
        ],
    )
    grads = pl.pallas_call(
        _backward_kernel(ntx, tile_h, tile_w, chunk_n, orig_nblk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (bwd_blocks, NCHAN, chunk_n), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.default_backend() != "tpu",
    )(starts, offs, blk_src, pair_blocks, ct_tiles)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def rasterize_gaussians(
    gdata,
    sorted_gid,
    starts,
    height: int,
    width: int,
    tile_h: int = 32,
    tile_w: int = 32,
    bwd_capacity_blocks: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite per-gaussian channel rows into an image via the sorted
    (gaussian, tile) pair list from binning.

    Args:
        gdata: (G + 1, NCHAN) per-gaussian channels (module docstring
            layout); row G is the sentinel (a0 = -1e30).
        sorted_gid: (cap,) int32 pair ids in (tile, depth) order.
        starts: (num_tiles + 1,) int32 element offsets of tile segments.
        bwd_capacity_blocks: static cap on the compacted backward buffers;
            None = num_blocks + num_tiles (never overflows). Size it from
            the sat_blocks output for saturated scenes.

    Returns:
        rgb (H, W, 3), depth (H, W), transmittance (H, W),
        kend (num_tiles,) int32 — per-tile chunks composited before
        saturation. sum(kend) is the backward's post-compaction block
        demand (tune bwd_capacity_blocks to >= it); combined with the
        sorted pair depths it yields the per-tile saturation depth that
        drives the next render's pair culling (render.py).
    """
    pair_blocks = _build_pair_blocks(gdata, sorted_gid)
    out, kend = _rasterize_fwd_impl(
        pair_blocks, starts, height, width, tile_h, tile_w
    )
    return jnp.moveaxis(out[:3], 0, -1), out[3], out[4], kend


def _fwd(
    gdata, sorted_gid, starts, height, width, tile_h, tile_w,
    bwd_capacity_blocks,
):
    pair_blocks = _build_pair_blocks(gdata, sorted_gid)
    out, kend = _rasterize_fwd_impl(
        pair_blocks, starts, height, width, tile_h, tile_w
    )
    rgb = jnp.moveaxis(out[:3], 0, -1)
    depth = out[3]
    t = out[4]
    return (rgb, depth, t, kend), (
        pair_blocks, sorted_gid, starts, kend, gdata.shape[0], rgb, depth, t,
    )


def _bwd(height, width, tile_h, tile_w, bwd_capacity_blocks, residuals, cts):
    (
        pair_blocks, sorted_gid, starts, kend, g1, rgb_final, depth_final,
        t_final,
    ) = residuals
    d_rgb, d_depth, d_t = cts[0], cts[1], cts[2]  # cts[3] (kend): int
    num_tiles = starts.shape[0] - 1
    nblk = pair_blocks.shape[0]
    chunk_n = pair_blocks.shape[2]
    cap = sorted_gid.shape[0]
    if bwd_capacity_blocks is None:
        bwd_capacity_blocks = nblk + num_tiles
    nblk2 = bwd_capacity_blocks

    # ---- saturation-compacted block map (module docstring) ----
    start_blk = starts[:-1] // chunk_n  # (T,) first original block per tile
    offs = jnp.minimum(
        jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(kend, dtype=jnp.int32)]
        ),
        nblk2,
    )  # (T + 1,) compacted block offsets, clipped to capacity
    # tile id per compacted block: marks at segment starts + prefix sum
    marks = (
        jnp.zeros((nblk2 + 1,), jnp.int32).at[offs[1:-1]].add(1)[:nblk2]
    )
    tile_of = jnp.cumsum(marks)  # (nblk2,)
    k_of = jnp.arange(nblk2, dtype=jnp.int32) - offs[tile_of]
    # compacted -> original block map; the kernel DMAs through it directly
    # (boundary blocks shared by two tiles are fetched twice — gradient
    # writes stay tile-private with zero slack)
    blk_src = jnp.clip(start_blk[tile_of] + k_of, 0, nblk - 1)

    d_planes = jnp.concatenate(
        [jnp.moveaxis(d_rgb, -1, 0), d_depth[None]], axis=0
    )  # (4, H, W)
    final4 = jnp.concatenate(
        [jnp.moveaxis(rgb_final, -1, 0), depth_final[None]], axis=0
    )
    v = jnp.sum(d_planes * final4, axis=0)  # (H, W)
    ct_planes = jnp.concatenate(
        [d_planes, d_t[None], t_final[None], v[None]], axis=0
    )
    grads = _rasterize_bwd_impl(
        pair_blocks, starts, offs, blk_src, ct_planes, nblk2, height, width,
        tile_h, tile_w,
    )

    # ---- segment-reduce accumulation keyed by gaussian id (docstring) ----
    # compacted row -> original pair position -> gid. Rows in blocks past
    # the compacted end (offs[T]) were never written by the kernel
    # (uninitialized memory): route them to the sentinel row. Foreign /
    # dead rows inside written blocks are exact kernel zeros — harmless.
    # The gid map is a whole-ROW take from the (nblk, chunk) view of
    # sorted_gid — the equivalent per-ELEMENT gather sorted_gid[pos]
    # measured 1.78 ms at 268k elements (6.6 ns/elem, the slow gather
    # form) vs ~0 for 2099 row takes (PERF.md round 4 trace).
    from gaussreg_tpu.gs.rasterizer.accumulate import segment_accumulate

    gnum = g1 - 1
    live = (jnp.arange(nblk2, dtype=jnp.int32) < offs[num_tiles])[:, None]
    gid = jnp.where(
        live, sorted_gid.reshape(nblk, chunk_n)[blk_src], gnum
    )  # (nblk2, chunk)
    # rows in blocks past the compacted end are UNINITIALIZED memory; the
    # scatter could dump them on the sentinel row, but the segment
    # reduction's one-hot matmul would propagate NaN (0 * NaN) — zero them
    grows = jnp.where(
        live[:, :, None], grads.transpose(0, 2, 1), 0.0
    ).reshape(-1, NCHAN)
    # DEFAULT: XLA scatter-add (13 ns/row op floor, 2.50 ms at the 32x32
    # bench shapes). The Pallas MXU segment reduction (accumulate.py) is
    # 2.3x faster STANDALONE (1.11 ms incl. its sort+gather feed), but
    # integrating it REGRESSES the full step 9.99 -> 17.0 ms: when the
    # custom call consumes the sorted-gather output, XLA splits the fused
    # projection/SH VJP chain and re-lays-out (G, 3, 16)-scale
    # intermediates (+6 ms of loop fusions / data formatting). Bisected
    # round 5: trivial pallas call -> clean; real kernel on synthetic
    # (sort-free) inputs -> clean; sort+gather without the kernel ->
    # clean; only the combination poisons the schedule, and
    # lax.optimization_barrier does not firewall it. Opt-in via
    # GAUSSREG_ACCUM=pallas until the XLA layout interaction is solved.
    import os as _os

    if _os.environ.get("GAUSSREG_ACCUM") == "pallas":
        d_gdata = segment_accumulate(
            grows, gid.reshape(-1), g1,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        d_gdata = (
            jnp.zeros((g1, NCHAN), grows.dtype)
            .at[gid.reshape(-1)]
            .add(grows)
        )
    # the sentinel row's cotangent is mathematically zero (alpha == 0 with
    # zero derivative); it only absorbed dead-row scatters
    d_gdata = d_gdata.at[gnum].set(0.0)
    return (
        d_gdata,
        np.zeros((cap,), dtype=jax.dtypes.float0),
        np.zeros(starts.shape, dtype=jax.dtypes.float0),
    )


rasterize_gaussians.defvjp(_fwd, _bwd)


def quadratic_coeffs(
    means2d: jnp.ndarray, conics: jnp.ndarray, opacities: jnp.ndarray
) -> jnp.ndarray:
    """Per-gaussian quadratic exponent coefficients (G, 6): power(px) =
    a0 + ax*x + ay*y + axx*x^2 + axy*x*y + ayy*y^2, with log(opacity) folded
    into a0 so alpha = exp(min(power, 0)) clamped. Differentiable — the
    kernel returns d/d_coeffs and autodiff maps back to means/conics/op."""
    mx, my = means2d[:, 0], means2d[:, 1]
    ca, cb, cc = conics[:, 0], conics[:, 1], conics[:, 2]
    log_op = jnp.log(jnp.maximum(opacities, 1e-12))
    a0 = -0.5 * (ca * mx * mx + cc * my * my) - cb * mx * my + log_op
    ax = ca * mx + cb * my
    ay = cc * my + cb * mx
    axx = -0.5 * ca
    axy = -cb
    ayy = -0.5 * cc
    return jnp.stack([a0, ax, ay, axx, axy, ayy], axis=1)
