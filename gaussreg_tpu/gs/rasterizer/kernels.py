"""Pallas TPU kernels: tile-based gaussian alpha compositing, forward +
analytic backward.

Design (see SURVEY.md §7.2 step 6 / §7.3):
- tiles are (tile_h x tile_w) pixel blocks sized for the VPU lane layout
  (tile_w = 128 lanes);
- per-tile gaussian lists come from binning.py as CHUNK-aligned ranges into
  a pair-major data array (P_aligned, 128): one 128-lane row per pair, so
  every chunked DMA is tiling-aligned, no two tiles ever share a chunk, and
  per-gaussian reads use a dynamic *sublane* index with static lane offsets
  (Mosaic cannot index lanes dynamically);
- forward walks each tile's pairs front-to-back, compositing into VMEM
  accumulators; backward walks back-to-front, reconstructing per-gaussian
  transmittance by division (alpha is clamped <= 0.99 so 1-alpha >= 0.01)
  and writing *per-pair* gradient rows — gradient accumulation to gaussians
  is the VJP of the pair gather outside the kernel (an XLA scatter-add),
  keeping the kernel atomics-free.

Pair channel layout (first 9 of 128 lanes used):
  0: mean_x  1: mean_y  2: conic_a  3: conic_b  4: conic_c
  5: opacity 6: r  7: g  8: b  9..127: padding
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
CHUNK = 256  # pair rows per DMA
NCHAN = 128  # channels per pair row (first 9 used; 128 so the dynamic
# per-gaussian index lands on the sublane dim and channel offsets are
# static lane indices — Mosaic cannot index lanes dynamically)
PACK = 1
CROWS = CHUNK


def _tile_pixel_coords(t, ntx, tile_h, tile_w):
    ty = t // ntx
    tx = t % ntx
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
        + ty.astype(jnp.float32) * tile_h
        + 0.5
    )
    px = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
        + tx.astype(jnp.float32) * tile_w
        + 0.5
    )
    return px, py


def _pr(chunk_ref, slot, j, c):
    """Read pair j's channel c from a (slots, CHUNK, 128) chunk: j is a
    dynamic sublane index, c a static lane index."""
    return chunk_ref[slot, j, c]


def _alpha_for(chunk_ref, slot, j, px, py):
    mx = _pr(chunk_ref, slot, j, 0)
    my = _pr(chunk_ref, slot, j, 1)
    ca = _pr(chunk_ref, slot, j, 2)
    cb = _pr(chunk_ref, slot, j, 3)
    cc = _pr(chunk_ref, slot, j, 4)
    op = _pr(chunk_ref, slot, j, 5)
    dx = px - mx
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    gauss = jnp.exp(jnp.minimum(power, 0.0))
    alpha = op * gauss
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, jnp.minimum(alpha, ALPHA_MAX))
    return alpha, gauss, (dx, dy), op


def _forward_kernel(ntx: int, tile_h: int, tile_w: int):
    def kernel(offsets_ref, counts_ref, pair_ref, out_ref, chunk, sem):
        t = pl.program_id(0)
        start = pl.multiple_of(offsets_ref[t], CHUNK)
        n = counts_ref[t]
        num_chunks = jax.lax.div(n + CHUNK - 1, CHUNK)

        px, py = _tile_pixel_coords(t, ntx, tile_h, tile_w)

        out_ref[0] = jnp.zeros((tile_h, tile_w), jnp.float32)
        out_ref[1] = jnp.zeros((tile_h, tile_w), jnp.float32)
        out_ref[2] = jnp.zeros((tile_h, tile_w), jnp.float32)
        out_ref[3] = jnp.ones((tile_h, tile_w), jnp.float32)

        def get_dma(slot, k):
            return pltpu.make_async_copy(
                pair_ref.at[pl.ds(pl.multiple_of(start + k * CHUNK, CHUNK), CHUNK), :],
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
            valid_in_chunk = jnp.minimum(n - k * CHUNK, CHUNK)

            def g_body(j, _):
                @pl.when(j < valid_in_chunk)
                def _():
                    alpha, _, _, _ = _alpha_for(chunk, slot, j, px, py)
                    t_cur = out_ref[3]
                    w = alpha * t_cur
                    out_ref[0] = out_ref[0] + _pr(chunk, slot, j, 6) * w
                    out_ref[1] = out_ref[1] + _pr(chunk, slot, j, 7) * w
                    out_ref[2] = out_ref[2] + _pr(chunk, slot, j, 8) * w
                    out_ref[3] = t_cur * (1.0 - alpha)

                return 0

            jax.lax.fori_loop(0, CHUNK, g_body, 0)
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    return kernel


def _backward_kernel(ntx: int, tile_h: int, tile_w: int):
    def kernel(
        offsets_ref, counts_ref, pair_ref, ct_ref, grad_out_ref,
        chunk, gchunk, sem, gsem,
    ):
        # ct_ref: (5, tile_h, tile_w) = [d_r, d_g, d_b, d_T, T_final]
        t = pl.program_id(0)
        start = pl.multiple_of(offsets_ref[t], CHUNK)
        n = counts_ref[t]
        num_chunks = jax.lax.div(n + CHUNK - 1, CHUNK)

        px, py = _tile_pixel_coords(t, ntx, tile_h, tile_w)
        d_r = ct_ref[0]
        d_g = ct_ref[1]
        d_b = ct_ref[2]
        d_t_final = ct_ref[3]
        t_final = ct_ref[4]

        def in_dma(slot, k):
            return pltpu.make_async_copy(
                pair_ref.at[pl.ds(pl.multiple_of(start + k * CHUNK, CHUNK), CHUNK), :],
                chunk.at[slot],
                sem.at[slot],
            )

        def out_dma(slot, k):
            return pltpu.make_async_copy(
                gchunk.at[slot],
                grad_out_ref.at[pl.ds(pl.multiple_of(start + k * CHUNK, CHUNK), CHUNK), :],
                gsem.at[slot],
            )

        def scoped(t_run, s_r, s_g, s_b):
            t_run[...] = t_final
            s_r[...] = jnp.zeros((tile_h, tile_w), jnp.float32)
            s_g[...] = jnp.zeros((tile_h, tile_w), jnp.float32)
            s_b[...] = jnp.zeros((tile_h, tile_w), jnp.float32)

            @pl.when(num_chunks > 0)
            def _():
                in_dma(0, num_chunks - 1).start()

            def chunk_body(kk, _):
                k = num_chunks - 1 - kk  # reverse chunk order
                slot = jax.lax.rem(kk, 2)

                @pl.when(kk + 1 < num_chunks)
                def _():
                    in_dma(jax.lax.rem(kk + 1, 2), k - 1).start()

                in_dma(slot, k).wait()

                # this slot's previous grad write-out must land before reuse
                @pl.when(kk >= 2)
                def _():
                    out_dma(slot, k + 2).wait()

                gchunk[slot] = jnp.zeros((CHUNK, NCHAN), jnp.float32)
                valid_in_chunk = jnp.minimum(n - k * CHUNK, CHUNK)

                def g_body(jj, _):
                    j = CHUNK - 1 - jj  # reverse within chunk

                    @pl.when(j < valid_in_chunk)
                    def _():
                        alpha, gauss, (dx, dy), op = _alpha_for(
                            chunk, slot, j, px, py
                        )
                        cr = _pr(chunk, slot, j, 6)
                        cg = _pr(chunk, slot, j, 7)
                        cb_col = _pr(chunk, slot, j, 8)
                        one_m = 1.0 - alpha
                        t_before = t_run[...] / one_m
                        d_alpha = (
                            (cr * d_r + cg * d_g + cb_col * d_b) * t_before
                            - (s_r[...] * d_r + s_g[...] * d_g + s_b[...] * d_b)
                            / one_m
                            - d_t_final * t_final / one_m
                        )
                        raw = op * gauss
                        active = (raw >= ALPHA_MIN) & (raw <= ALPHA_MAX)
                        d_alpha = jnp.where(active, d_alpha, 0.0)

                        w = alpha * t_before
                        gchunk[slot, j, 6] = jnp.sum(d_r * w)
                        gchunk[slot, j, 7] = jnp.sum(d_g * w)
                        gchunk[slot, j, 8] = jnp.sum(d_b * w)

                        d_power = d_alpha * alpha
                        gchunk[slot, j, 5] = jnp.sum(d_alpha * gauss)
                        gchunk[slot, j, 2] = jnp.sum(d_power * (-0.5 * dx * dx))
                        gchunk[slot, j, 3] = jnp.sum(d_power * (-dx * dy))
                        gchunk[slot, j, 4] = jnp.sum(d_power * (-0.5 * dy * dy))
                        ca = _pr(chunk, slot, j, 2)
                        cb = _pr(chunk, slot, j, 3)
                        cc = _pr(chunk, slot, j, 4)
                        d_dx = d_power * (-(ca * dx + cb * dy))
                        d_dy = d_power * (-(cc * dy + cb * dx))
                        gchunk[slot, j, 0] = -jnp.sum(d_dx)
                        gchunk[slot, j, 1] = -jnp.sum(d_dy)

                        s_r[...] = s_r[...] + cr * w
                        s_g[...] = s_g[...] + cg * w
                        s_b[...] = s_b[...] + cb_col * w
                        t_run[...] = t_before

                    return 0

                jax.lax.fori_loop(0, CHUNK, g_body, 0)
                out_dma(slot, k).start()
                return 0

            jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

            @pl.when(num_chunks >= 1)
            def _():
                out_dma(jax.lax.rem(num_chunks - 1, 2), 0).wait()

            @pl.when(num_chunks >= 2)
            def _():
                out_dma(jax.lax.rem(num_chunks - 2, 2), 1).wait()

        pl.run_scoped(
            scoped,
            t_run=pltpu.VMEM((tile_h, tile_w), jnp.float32),
            s_r=pltpu.VMEM((tile_h, tile_w), jnp.float32),
            s_g=pltpu.VMEM((tile_h, tile_w), jnp.float32),
            s_b=pltpu.VMEM((tile_h, tile_w), jnp.float32),
        )

    return kernel


def pack_pair_rows(pair_rows: jnp.ndarray) -> jnp.ndarray:
    """Identity — pair rows are already (P_aligned, NCHAN)."""
    assert pair_rows.shape[1] == NCHAN, pair_rows.shape
    return pair_rows


def unpack_pair_rows(packed: jnp.ndarray) -> jnp.ndarray:
    return packed


@functools.partial(
    jax.jit, static_argnames=("height", "width", "tile_h", "tile_w")
)
def _rasterize_fwd_impl(
    packed_pairs, tile_offsets, tile_counts, height, width, tile_h, tile_w
):
    ntx = width // tile_w
    nty = height // tile_h
    num_tiles = ntx * nty
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (4, tile_h, tile_w),
            lambda t, offsets, counts: (0, t // ntx, t % ntx),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, NCHAN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _forward_kernel(ntx, tile_h, tile_w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, height, width), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(tile_offsets, tile_counts, packed_pairs)
    return out


@functools.partial(
    jax.jit, static_argnames=("height", "width", "tile_h", "tile_w")
)
def _rasterize_bwd_impl(
    packed_pairs, tile_offsets, tile_counts, ct_planes, height, width, tile_h, tile_w
):
    ntx = width // tile_w
    nty = height // tile_h
    num_tiles = ntx * nty
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (5, tile_h, tile_w),
                lambda t, offsets, counts: (0, t // ntx, t % ntx),
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, NCHAN), jnp.float32),
            pltpu.VMEM((2, CHUNK, NCHAN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    grads = pl.pallas_call(
        _backward_kernel(ntx, tile_h, tile_w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(packed_pairs.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.default_backend() != "tpu",
    )(tile_offsets, tile_counts, packed_pairs, ct_planes)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def rasterize_pairs(
    pair_rows,
    tile_offsets,
    tile_counts,
    height: int,
    width: int,
    tile_h: int = 16,
    tile_w: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite aligned (gaussian, tile) pair data into an image.

    Args:
        pair_rows: (P_aligned, 16) pair-major channels (P_aligned a multiple
            of PACK; segments aligned to CHUNK by binning).
        tile_offsets: (num_tiles + 1,) int32 aligned ranges into pair_rows.
        tile_counts: (num_tiles,) int32 true per-tile pair counts.

    Returns:
        rgb (H, W, 3), transmittance (H, W).
    """
    out = _rasterize_fwd_impl(
        pack_pair_rows(pair_rows), tile_offsets, tile_counts, height, width,
        tile_h, tile_w,
    )
    return jnp.moveaxis(out[:3], 0, -1), out[3]


def _fwd(pair_rows, tile_offsets, tile_counts, height, width, tile_h, tile_w):
    out = _rasterize_fwd_impl(
        pack_pair_rows(pair_rows), tile_offsets, tile_counts, height, width,
        tile_h, tile_w,
    )
    rgb = jnp.moveaxis(out[:3], 0, -1)
    t = out[3]
    return (rgb, t), (pair_rows, tile_offsets, tile_counts, t)


def _bwd(height, width, tile_h, tile_w, residuals, cts):
    pair_rows, tile_offsets, tile_counts, t_final = residuals
    d_rgb, d_t = cts
    ct_planes = jnp.concatenate(
        [jnp.moveaxis(d_rgb, -1, 0), d_t[None], t_final[None]], axis=0
    )
    packed_grads = _rasterize_bwd_impl(
        pack_pair_rows(pair_rows), tile_offsets, tile_counts, ct_planes,
        height, width, tile_h, tile_w,
    )
    grads = unpack_pair_rows(packed_grads)
    covered = (
        jnp.arange(pair_rows.shape[0], dtype=jnp.int32) < tile_offsets[-1]
    )
    grads = jnp.where(covered[:, None], grads, 0.0)
    d_offsets = np.zeros(tile_offsets.shape, dtype=jax.dtypes.float0)
    d_counts = np.zeros(tile_counts.shape, dtype=jax.dtypes.float0)
    return grads, d_offsets, d_counts


rasterize_pairs.defvjp(_fwd, _bwd)
