"""Per-pair gradient -> per-gaussian accumulation (atomics-free scatter-add).

TPUs have no scatter hardware and XLA's big-array gathers/scatters run at
~5 ns/element; reductions by key are MXU problems. This kernel accumulates
the rasterizer's per-pair gradient blocks onto gaussians with one-hot
matmuls: the grid walks gaussian blocks (gaussians are pre-sorted by their
first screen tile, so each block's pairs live in a short contiguous range of
pair blocks — prefetched as [gblock_lo, gblock_hi) scalars); for each pair
block in range, acc (NCHAN, GB) += gchunk (NCHAN, K) @ onehot(GB, K)^T where
onehot[g, k] = (pair_id[k] == block_base + g). Pairs belonging to other
blocks (range overlap) are filtered by the one-hot — correctness never
depends on the sort, only locality does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussreg_tpu.gs.rasterizer.kernels import NCHAN


def _accum_kernel(gblock: int, chunk: int):
    def kernel(
        lo_ref, hi_ref, grads_ref, ids_ref, out_ref, gchunk, idchunk, sem,
        idsem, acc,
    ):
        b = pl.program_id(0)
        lo = lo_ref[b]
        hi = hi_ref[b]
        base = b * gblock
        grow = jax.lax.broadcasted_iota(jnp.int32, (gblock, 1), 0) + base

        acc[...] = jnp.zeros((NCHAN, gblock), jnp.float32)

        def dma(slot, k):
            return (
                pltpu.make_async_copy(grads_ref.at[k], gchunk.at[slot], sem.at[slot]),
                pltpu.make_async_copy(ids_ref.at[k], idchunk.at[slot], idsem.at[slot]),
            )

        @pl.when(lo < hi)
        def _():
            for d in dma(0, lo):
                d.start()

        def body(k):
            slot = jax.lax.rem(k - lo, 2)

            @pl.when(k + 1 < hi)
            def _():
                for d in dma(jax.lax.rem(k + 1 - lo, 2), k + 1):
                    d.start()

            for d in dma(slot, k):
                d.wait()

            oh = (idchunk[slot] == grow).astype(jnp.float32)  # (GB, K)
            acc[...] = acc[...] + jax.lax.dot_general(
                gchunk[slot], oh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        jax.lax.fori_loop(lo, hi, lambda k, _: (body(k), 0)[1], 0)
        out_ref[...] = acc[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("gblock",))
def accumulate_pair_grads(
    grad_blocks: jnp.ndarray,  # (nblk, NCHAN, chunk) f32 per-pair grads
    pair_ids: jnp.ndarray,  # (nblk, chunk) int32
    gblock_lo: jnp.ndarray,  # (n_gblocks,) int32
    gblock_hi: jnp.ndarray,  # (n_gblocks,) int32
    gblock: int = 256,
) -> jnp.ndarray:
    """Returns d_gdata (n_gblocks * gblock, NCHAN) f32."""
    n_gblocks = gblock_lo.shape[0]
    chunk = grad_blocks.shape[2]
    ids3 = pair_ids.reshape(pair_ids.shape[0], 1, chunk)
    out = pl.pallas_call(
        _accum_kernel(gblock, chunk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_gblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (NCHAN, gblock), lambda b, lo, hi: (0, b)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, NCHAN, chunk), jnp.float32),
                pltpu.VMEM((2, 1, chunk), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((NCHAN, gblock), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((NCHAN, n_gblocks * gblock), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(gblock_lo, gblock_hi, grad_blocks, ids3)
    return out.T
