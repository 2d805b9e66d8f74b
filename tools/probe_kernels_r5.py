#!/usr/bin/env python
"""Round-5 rasterizer kernel-variant microbench (VERDICT r4 #1).

The round-4 trace put the Pallas kernels at ~3.6 ms of the 9.6 ms step
(fwd 1.34 + bwd 2.29 at 32x16). Per-block cost is dominated by the
(K, K) @ (K, NPIX) triangular prefix matmul (16.8M MACs f32 at 32x32)
plus the exp/log1p transcendental chain. This probe times the forward
compositing loop with interchangeable math cores:

  A  current: f32 tri matmul, log-space prefix (exp + log1p)
  B  bf16 tri matmul single pass (0/1 matrix exact in bf16; lg rounded)
  C  bf16x2: lg split hi/lo, two bf16 passes, f32 accumulate (~2^-18 rel)
  D  cumprod-roll: linear-space prefix product via log-step sublane rolls
     (no matmul, no transcendentals beyond the alpha exp)

Each variant runs the same unaligned block walk as the real forward
kernel; parity is checked against A. Slope-timed on-chip.
"""

import functools
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
NCHAN = 16
T_EPS = 1e-4
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def _phi(t, ntx, tile_h, tile_w):
    npix = tile_h * tile_w
    ty = (t // ntx).astype(jnp.float32)
    tx = (t % ntx).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    x = (lane % tile_w).astype(jnp.float32) + tx * tile_w + 0.5
    y = (lane // tile_w).astype(jnp.float32) + ty * tile_h + 0.5
    one = jnp.ones((1, npix), jnp.float32)
    zero = jnp.zeros((1, npix), jnp.float32)
    return jnp.concatenate([one, x, y, x * x, x * y, y * y, zero, zero], 0)


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(variant, ntx, tile_h, tile_w, chunk_n, nblk):
    npix = tile_h * tile_w
    cap = nblk * chunk_n

    def kernel(starts_ref, pair_ref, out_ref, chunk, sem, rgb_acc, t_row):
        t = pl.program_id(0)
        c0 = jnp.minimum(starts_ref[t], cap)
        c1 = jnp.minimum(starts_ref[t + 1], cap)
        n = c1 - c0
        start_blk = jax.lax.div(c0, chunk_n)
        num_chunks = jnp.where(
            n > 0, jax.lax.div(c1 - 1, chunk_n) - start_blk + 1, 0
        )
        phi = _phi(t, ntx, tile_h, tile_w)
        r = jax.lax.broadcasted_iota(jnp.int32, (chunk_n, chunk_n), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (chunk_n, chunk_n), 1)
        l_strict = (r > c).astype(jnp.float32)
        l_strict_bf = l_strict.astype(jnp.bfloat16)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (chunk_n, 1), 0)

        rgb_acc[...] = jnp.zeros((5, npix), jnp.float32)
        t_row[...] = jnp.ones((1, npix), jnp.float32)

        def get_dma(slot, k):
            return pltpu.make_async_copy(
                pair_ref.at[start_blk + k], chunk.at[slot], sem.at[slot]
            )

        @pl.when(num_chunks > 0)
        def _():
            get_dma(0, 0).start()

        def chunk_body(k):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < num_chunks)
            def _():
                get_dma(jax.lax.rem(k + 1, 2), k + 1).start()

            get_dma(slot, k).wait()
            coeffs = chunk[slot]
            gpos = (start_blk + k) * chunk_n + row_ids
            rowmask = ((gpos >= c0) & (gpos < c1)).astype(jnp.float32)
            power = _dot(coeffs[0:8], phi, (((0,), (0,))))
            raw = jnp.exp(jnp.minimum(power, 0.0))
            alpha = jnp.where(raw < ALPHA_MIN, 0.0, jnp.minimum(raw, ALPHA_MAX))
            alpha = alpha * rowmask
            colors = coeffs[8:12]

            if variant in ("A", "B", "C"):
                lg = jnp.log1p(-alpha)
                if variant == "A":
                    cum = _dot(l_strict, lg, (((1,), (0,))))
                elif variant == "B":
                    cum = _dot(
                        l_strict_bf, lg.astype(jnp.bfloat16), (((1,), (0,)))
                    )
                else:
                    hi = lg.astype(jnp.bfloat16)
                    lo = (lg - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    cum = _dot(l_strict_bf, hi, (((1,), (0,)))) + _dot(
                        l_strict_bf, lo, (((1,), (0,)))
                    )
                tj = t_row[...] * jnp.exp(cum)
                w = alpha * tj
                new_t = t_row[...] * jnp.exp(
                    cum[chunk_n - 1 : chunk_n, :]
                    + lg[chunk_n - 1 : chunk_n, :]
                )
            else:  # D: linear-space prefix product, no tri matmul / exp
                om = 1.0 - alpha
                incl = om
                shift = 1
                while shift < chunk_n:
                    rolled = pltpu.roll(incl, shift, 0)
                    keep = (row_ids >= shift).astype(jnp.float32)
                    incl = incl * (rolled * keep + (1.0 - keep))
                    shift *= 2
                excl_r = pltpu.roll(incl, 1, 0)
                keep0 = (row_ids >= 1).astype(jnp.float32)
                excl = excl_r * keep0 + (1.0 - keep0)
                w = t_row[...] * (excl - incl)
                new_t = t_row[...] * incl[chunk_n - 1 : chunk_n, :]

            rgb_acc[0:4] = rgb_acc[0:4] + _dot(colors, w, (((1,), (0,))))
            t_row[...] = new_t
            return jnp.max(new_t)

        def cond(carry):
            k, tmax = carry
            return (k < num_chunks) & (tmax >= T_EPS)

        def body(carry):
            k, _ = carry
            return k + 1, chunk_body(k)

        k_end, _ = jax.lax.while_loop(cond, body, (0, jnp.float32(1.0)))

        @pl.when(k_end < num_chunks)
        def _():
            get_dma(jax.lax.rem(k_end, 2), k_end).wait()

        rgb_acc[4:5] = t_row[...]
        out_ref[0, 0:5] = rgb_acc[...]
        out_ref[0, 5:6] = jnp.full((1, npix), k_end, jnp.float32)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("variant", "num_tiles", "tile_h", "tile_w")
)
def run_fwd(pair_blocks, starts, variant, num_tiles, tile_h, tile_w):
    chunk_n = pair_blocks.shape[2]
    nblk = pair_blocks.shape[0]
    ntx = 640 // tile_w
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
    return pl.pallas_call(
        _fwd_kernel(variant, ntx, tile_h, tile_w, chunk_n, nblk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 6, npix), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(starts, pair_blocks)


def make_blocks(num_tiles=300, blocks_per_tile=7, seed=0):
    """Synthetic channel-major pair blocks with a realistic alpha mix."""
    nblk = num_tiles * blocks_per_tile
    rng = np.random.default_rng(seed)
    g = nblk * CHUNK
    blocks = np.zeros((nblk, NCHAN, CHUNK), np.float32)
    # quadratic coeffs for gaussians centered inside each tile
    tile_w = tile_h = 32
    ntx = 640 // tile_w
    for b in range(nblk):
        t = b // blocks_per_tile
        tx, ty = t % ntx, t // ntx
        cx = rng.uniform(0, tile_w, CHUNK) + tx * tile_w
        cy = rng.uniform(0, tile_h, CHUNK) + ty * tile_h
        inv_s2 = 1.0 / rng.uniform(2.0, 40.0, CHUNK) ** 2
        # low opacity: no tile saturates, every block is walked (kend ==
        # blocks_per_tile) so the slope measures per-block cost, not the
        # early-exit point
        op = rng.uniform(0.01, 0.05, CHUNK)
        a0 = -0.5 * inv_s2 * (cx * cx + cy * cy) + np.log(op)
        blocks[b, 0] = a0
        blocks[b, 1] = inv_s2 * cx
        blocks[b, 2] = inv_s2 * cy
        blocks[b, 3] = -0.5 * inv_s2
        blocks[b, 4] = 0.0
        blocks[b, 5] = -0.5 * inv_s2
        blocks[b, 8:12] = rng.uniform(0, 1, (4, CHUNK))
    starts = np.arange(num_tiles + 1, dtype=np.int32) * blocks_per_tile * CHUNK
    return jnp.asarray(blocks), jnp.asarray(starts), g


def slope(fn, r_lo=4, r_hi=16, n_meas=3):
    def looped(salt, R):
        def body(i, acc):
            return acc + fn(i + salt)
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    f = jax.jit(looped, static_argnames="R")
    float(f(0, R=r_lo))
    float(f(0, R=r_hi))
    salt = itertools.count(1)

    def meas(R):
        ts = []
        for _ in range(n_meas):
            t0 = time.time()
            float(f(next(salt), R=R))
            ts.append(time.time() - t0)
        return min(ts)

    return (meas(r_hi) - meas(r_lo)) / (r_hi - r_lo)


def main():
    tile_h = tile_w = 32
    num_tiles = 300
    blocks, starts, _ = make_blocks(num_tiles=num_tiles, blocks_per_tile=7)
    print(f"blocks {blocks.shape} tiles {num_tiles}")

    ref = None
    for v in ["A", "B", "C", "D"]:
        out = np.asarray(
            run_fwd(blocks, starts, v, num_tiles, tile_h, tile_w)
        )
        if ref is None:
            ref = out
            print(
                f"{v}: reference; kend mean "
                f"{out[:, 5, 0].mean():.2f} (want = blocks_per_tile)"
            )
        else:
            diff = np.max(np.abs(out[:, :5] - ref[:, :5]))
            print(f"{v}: maxdiff vs A = {diff:.3e}")

    for v in ["A", "B", "C", "D"]:
        def one(i, v=v):
            b = blocks.at[0, 0, 0].add(1e-6 * jnp.float32(i) * 0)
            b = blocks + 1e-9 * jnp.float32(i)
            return jnp.sum(
                run_fwd(b, starts, v, num_tiles, tile_h, tile_w)[:, 4]
            )

        dt = slope(one)
        print(f"variant {v}: {dt*1e3:.3f} ms  ({dt*1e9/blocks.shape[0]:.0f} ns/blk)")


if __name__ == "__main__":
    main()
