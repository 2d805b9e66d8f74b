"""Pallas TPU kernels: tile-based gaussian alpha compositing, forward +
analytic backward.

Design (see SURVEY.md §7.2 step 6 / §7.3):
- tiles are (tile_h x tile_w) pixel blocks sized for the VPU lane layout
  (tile_w = 128 lanes);
- per-tile gaussian lists come from binning.py as ranges into a pair-major
  data array (P_pad, 16) whose rows are pre-gathered per (gaussian, tile)
  pair, so the kernel streams contiguous chunks (double-buffered DMA) —
  no per-gaussian gather inside the kernel;
- forward walks each tile's pairs front-to-back, compositing into VMEM
  accumulators; backward walks back-to-front, reconstructing per-gaussian
  transmittance by division (alpha is clamped <= 0.99 so 1-alpha >= 0.01)
  and writing *per-pair* gradient rows — gradient accumulation to gaussians
  is a segment-sum outside the kernel, which keeps the kernel atomics-free.

Pair-data channel layout (P_pad, 16):
  0: mean_x  1: mean_y  2: conic_a  3: conic_b  4: conic_c
  5: opacity 6: r  7: g  8: b  9..15: padding
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
NCHAN = 16


def _tile_pixel_coords(t, ntx, tile_h, tile_w):
    ty = t // ntx
    tx = t % ntx
    py = (
        jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0)
        + ty.astype(jnp.float32) * tile_h
        + 0.5
    )
    px = (
        jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1)
        + tx.astype(jnp.float32) * tile_w
        + 0.5
    )
    return px, py


def _alpha_for(chunk_ref, j, px, py):
    """Compute this gaussian's alpha over the tile. Returns (alpha, gauss)
    where gauss = exp(power) before the opacity multiply."""
    mx = chunk_ref[j, 0]
    my = chunk_ref[j, 1]
    ca = chunk_ref[j, 2]
    cb = chunk_ref[j, 3]
    cc = chunk_ref[j, 4]
    op = chunk_ref[j, 5]
    dx = px - mx
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    gauss = jnp.exp(jnp.minimum(power, 0.0))
    alpha = op * gauss
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, jnp.minimum(alpha, ALPHA_MAX))
    return alpha, gauss, (dx, dy)


def _forward_kernel(ntx: int, tile_h: int, tile_w: int):
    def kernel(offsets_ref, pair_ref, out_ref, chunk, sem):
        t = pl.program_id(0)
        start = offsets_ref[t]
        end = offsets_ref[t + 1]
        n = end - start
        num_chunks = jax.lax.div(n + CHUNK - 1, CHUNK)

        px, py = _tile_pixel_coords(t, ntx, tile_h, tile_w)

        out_ref[0] = jnp.zeros((tile_h, tile_w), jnp.float32)
        out_ref[1] = jnp.zeros((tile_h, tile_w), jnp.float32)
        out_ref[2] = jnp.zeros((tile_h, tile_w), jnp.float32)
        out_ref[3] = jnp.ones((tile_h, tile_w), jnp.float32)

        def get_dma(slot, k):
            return pltpu.make_async_copy(
                pair_ref.at[pl.ds(start + k * CHUNK, CHUNK), :],
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
            base = k * CHUNK
            valid_in_chunk = jnp.minimum(n - base, CHUNK)

            def g_body(j, _):
                @pl.when(j < valid_in_chunk)
                def _():
                    alpha, _, _ = _alpha_for(chunk.at[slot], j, px, py)
                    t_cur = out_ref[3]
                    w = alpha * t_cur
                    out_ref[0] = out_ref[0] + chunk[slot, j, 6] * w
                    out_ref[1] = out_ref[1] + chunk[slot, j, 7] * w
                    out_ref[2] = out_ref[2] + chunk[slot, j, 8] * w
                    out_ref[3] = t_cur * (1.0 - alpha)

                return 0

            jax.lax.fori_loop(0, CHUNK, g_body, 0)
            return 0

        jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

    return kernel


def _backward_kernel(ntx: int, tile_h: int, tile_w: int):
    def kernel(offsets_ref, pair_ref, ct_ref, grad_out_ref, chunk, gchunk, sem, gsem):
        # ct_ref: (5, tile_h, tile_w) = [d_r, d_g, d_b, d_T, T_final]
        t = pl.program_id(0)
        start = offsets_ref[t]
        end = offsets_ref[t + 1]
        n = end - start
        num_chunks = jax.lax.div(n + CHUNK - 1, CHUNK)

        px, py = _tile_pixel_coords(t, ntx, tile_h, tile_w)
        d_r = ct_ref[0]
        d_g = ct_ref[1]
        d_b = ct_ref[2]
        d_t_final = ct_ref[3]
        t_final = ct_ref[4]

        def in_dma(slot, k):
            return pltpu.make_async_copy(
                pair_ref.at[pl.ds(start + k * CHUNK, CHUNK), :],
                chunk.at[slot],
                sem.at[slot],
            )

        def out_dma(slot, k):
            return pltpu.make_async_copy(
                gchunk.at[slot],
                grad_out_ref.at[pl.ds(start + k * CHUNK, CHUNK), :],
                gsem.at[slot],
            )

        # state carried across the reverse walk lives in VMEM scratch refs
        def scoped(t_run, s_r, s_g, s_b):
            t_run[...] = t_final
            s_r[...] = jnp.zeros((tile_h, tile_w), jnp.float32)
            s_g[...] = jnp.zeros((tile_h, tile_w), jnp.float32)
            s_b[...] = jnp.zeros((tile_h, tile_w), jnp.float32)

            @pl.when(num_chunks > 0)
            def _():
                in_dma(0, num_chunks - 1).start()

            def chunk_body(kk, _):
                # reverse chunk order
                k = num_chunks - 1 - kk
                slot = jax.lax.rem(kk, 2)

                @pl.when(kk + 1 < num_chunks)
                def _():
                    in_dma(jax.lax.rem(kk + 1, 2), k - 1).start()

                in_dma(slot, k).wait()
                # wait for the previous grad write-out of this slot
                @pl.when(kk >= 2)
                def _():
                    out_dma(slot, k + 2).wait()

                base = k * CHUNK
                valid_in_chunk = jnp.minimum(n - base, CHUNK)

                def g_body(jj, _):
                    j = CHUNK - 1 - jj  # reverse within chunk

                    @pl.when(j < valid_in_chunk)
                    def _():
                        alpha, gauss, (dx, dy) = _alpha_for(
                            chunk.at[slot], j, px, py
                        )
                        op = chunk[slot, j, 5]
                        cr = chunk[slot, j, 6]
                        cg = chunk[slot, j, 7]
                        cb_col = chunk[slot, j, 8]
                        one_m = 1.0 - alpha
                        t_before = t_run[...] / one_m
                        # d alpha from the color sum and final transmittance
                        d_alpha = (
                            (cr * d_r + cg * d_g + cb_col * d_b) * t_before
                            - (s_r[...] * d_r + s_g[...] * d_g + s_b[...] * d_b)
                            / one_m
                            - d_t_final * t_final / one_m
                        )
                        # clamp masks: zero grad where alpha was zeroed/clamped
                        raw = op * gauss
                        active = (raw >= ALPHA_MIN) & (raw <= ALPHA_MAX)
                        d_alpha = jnp.where(active, d_alpha, 0.0)

                        w = alpha * t_before
                        gchunk[slot, j, 6] = jnp.sum(d_r * w)
                        gchunk[slot, j, 7] = jnp.sum(d_g * w)
                        gchunk[slot, j, 8] = jnp.sum(d_b * w)

                        d_op = jnp.sum(d_alpha * gauss)
                        d_power = d_alpha * alpha  # = d_alpha * op * gauss
                        gchunk[slot, j, 5] = d_op
                        gchunk[slot, j, 2] = jnp.sum(d_power * (-0.5 * dx * dx))
                        gchunk[slot, j, 3] = jnp.sum(d_power * (-dx * dy))
                        gchunk[slot, j, 4] = jnp.sum(d_power * (-0.5 * dy * dy))
                        ca = chunk[slot, j, 2]
                        cb = chunk[slot, j, 3]
                        cc = chunk[slot, j, 4]
                        d_dx = d_power * (-(ca * dx + cb * dy))
                        d_dy = d_power * (-(cc * dy + cb * dx))
                        gchunk[slot, j, 0] = -jnp.sum(d_dx)
                        gchunk[slot, j, 1] = -jnp.sum(d_dy)
                        # update reverse-walk state
                        s_r[...] = s_r[...] + cr * w
                        s_g[...] = s_g[...] + cg * w
                        s_b[...] = s_b[...] + cb_col * w
                        t_run[...] = t_before

                    @pl.when(j >= valid_in_chunk)
                    def _():
                        gchunk[slot, j, :] = jnp.zeros((NCHAN,), jnp.float32)

                    return 0

                jax.lax.fori_loop(0, CHUNK, g_body, 0)
                out_dma(slot, k).start()
                return 0

            jax.lax.fori_loop(0, num_chunks, chunk_body, 0)

            # drain outstanding grad writes
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


@functools.partial(
    jax.jit, static_argnames=("height", "width", "tile_h", "tile_w")
)
def _rasterize_fwd_impl(pair_data, tile_offsets, height, width, tile_h, tile_w):
    ntx = width // tile_w
    nty = height // tile_h
    num_tiles = ntx * nty
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (4, tile_h, tile_w),
            lambda t, offsets: (0, t // ntx, t % ntx),
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
    )(tile_offsets, pair_data)
    return out


@functools.partial(
    jax.jit, static_argnames=("height", "width", "tile_h", "tile_w")
)
def _rasterize_bwd_impl(
    pair_data, tile_offsets, ct_planes, height, width, tile_h, tile_w
):
    ntx = width // tile_w
    nty = height // tile_h
    num_tiles = ntx * nty
    p_pad = pair_data.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (5, tile_h, tile_w),
                lambda t, offsets: (0, t // ntx, t % ntx),
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
        out_shape=jax.ShapeDtypeStruct((p_pad, NCHAN), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.default_backend() != "tpu",
    )(tile_offsets, pair_data, ct_planes)
    return grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def rasterize_pairs(
    pair_data, tile_offsets, height: int, width: int, tile_h: int = 16, tile_w: int = 128
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Composite sorted (gaussian, tile) pair data into an image.

    Args:
        pair_data: (P_pad, 16) pair-major channels (see module docstring);
            P_pad must be >= max tile range end + CHUNK.
        tile_offsets: (num_tiles + 1,) int32 ranges into pair_data.

    Returns:
        rgb (H, W, 3), transmittance (H, W).
    """
    out = _rasterize_fwd_impl(pair_data, tile_offsets, height, width, tile_h, tile_w)
    return jnp.moveaxis(out[:3], 0, -1), out[3]


def _fwd(pair_data, tile_offsets, height, width, tile_h, tile_w):
    out = _rasterize_fwd_impl(pair_data, tile_offsets, height, width, tile_h, tile_w)
    rgb = jnp.moveaxis(out[:3], 0, -1)
    t = out[3]
    return (rgb, t), (pair_data, tile_offsets, t)


def _bwd(height, width, tile_h, tile_w, residuals, cts):
    pair_data, tile_offsets, t_final = residuals
    d_rgb, d_t = cts
    ct_planes = jnp.concatenate(
        [jnp.moveaxis(d_rgb, -1, 0), d_t[None], t_final[None]], axis=0
    )
    grads = _rasterize_bwd_impl(
        pair_data, tile_offsets, ct_planes, height, width, tile_h, tile_w
    )
    covered = (
        jnp.arange(pair_data.shape[0], dtype=jnp.int32) < tile_offsets[-1]
    )
    grads = jnp.where(covered[:, None], grads, 0.0)
    d_offsets = np.zeros(tile_offsets.shape, dtype=jax.dtypes.float0)
    return grads, d_offsets


rasterize_pairs.defvjp(_fwd, _bwd)
