"""Per-gaussian gradient accumulation as a Pallas segment-reduction kernel.

Replaces the XLA scatter-add in the rasterizer backward (VERDICT r4 #1):
`zeros(G + 1, 16).at[gid].add(rows)` costs ~13 ns/row on a v5e — an XLA
scatter op floor, ~100x above memory speed-of-light for the ~11 MB moved
(PERF.md round-4 trace: 2.50 ms at the 32x32 bench shapes). The TPU-native
form is a segment reduction: sort the row ids by gaussian, gather the rows
into gid order (both forms XLA executes near their measured floors), then
reduce runs of equal gid on the MXU — a (CG, 128) one-hot "scatter matrix"
contracted with each 128-row block:

    out[512c : 512(c+1)] = sum_b onehot(gid_blk - 512c) @ rows_blk

The grid runs over gaussian chunks of CG rows; chunk c walks the aligned
128-row blocks covering its sorted-row range [bounds[c], bounds[c + 1])
(scalar-prefetched searchsorted bounds). Rows of neighbouring chunks inside
a shared boundary block miss the one-hot (their gid is outside the chunk's
range) and contribute exact zeros, so the walk needs no row masking — the
same unaligned-walk trick as the rasterizer kernels. The one-hot matmul
runs at HIGHEST precision: 0/1 entries are exact in every pass, so the
result is a true f32 sum like the scatter it replaces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NCHAN = 16
ROWBLK = 128


def _accum_kernel(cg: int, nchan: int, nrowblk: int):
    def kernel(bounds_ref, rows_ref, gid_ref, out_ref, rblk, gblk, sem, gsem,
               acc):
        c = pl.program_id(0)
        r0 = bounds_ref[c]
        r1 = bounds_ref[c + 1]
        b0 = jax.lax.div(r0, ROWBLK)
        nb = jnp.where(
            r1 > r0, jax.lax.div(r1 - 1, ROWBLK) - b0 + 1, 0
        )
        base = c * cg
        col = jax.lax.broadcasted_iota(jnp.int32, (cg, ROWBLK), 0)

        def row_dma(slot, k):
            return pltpu.make_async_copy(
                rows_ref.at[b0 + k], rblk.at[slot], sem.at[slot]
            )

        def gid_dma(slot, k):
            return pltpu.make_async_copy(
                gid_ref.at[b0 + k], gblk.at[slot], gsem.at[slot]
            )

        @pl.when(nb > 0)
        def _():
            row_dma(0, 0).start()
            gid_dma(0, 0).start()

        acc[...] = jnp.zeros((cg, nchan), jnp.float32)

        def body(k, _):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < nb)
            def _():
                row_dma(jax.lax.rem(k + 1, 2), k + 1).start()
                gid_dma(jax.lax.rem(k + 1, 2), k + 1).start()

            row_dma(slot, k).wait()
            gid_dma(slot, k).wait()
            rel = gblk[slot] - base  # (1, ROWBLK) relative gid
            onehot = (rel == col).astype(jnp.float32)  # (CG, ROWBLK)
            # rows_blk is channel-major (nchan, ROWBLK) — lane-aligned for
            # the DMA (a (ROWBLK, nchan) block slice fails Mosaic's 128-lane
            # tiling); contract the shared ROWBLK axis. HIGHEST: the 0/1
            # one-hot is exact in every bf16 pass, making this a true f32
            # accumulation (scatter parity).
            acc[...] = acc[...] + jax.lax.dot_general(
                onehot, rblk[slot],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return 0

        jax.lax.fori_loop(0, nb, body, 0)
        out_ref[...] = acc[...]

    return kernel


def segment_accumulate(
    rows: jnp.ndarray,  # (R, NCHAN) f32 gradient rows, R % 128 == 0
    gid: jnp.ndarray,  # (R,) int32 target row per gradient row, 0 <= gid
    num_out: int,  # output table rows (G + 1 with the sentinel row)
    cg: int = 512,  # gaussian rows per grid chunk
    interpret: bool = False,
) -> jnp.ndarray:
    """out[g] = sum of rows[i] where gid[i] == g — MXU segment reduction.

    Exact f32 sum (addition order differs from XLA scatter only across
    blocks of disjoint row sets, which is associative-exact per lane
    ordering; parity tested). gid may be unsorted — sorted internally.
    """
    r, nchan = rows.shape
    assert nchan == NCHAN, nchan
    assert r % ROWBLK == 0, r
    # stable: rows of one gaussian keep their compacted-position order, so
    # the f32 addition order (and thus the bit-exact result) is invariant
    # to the buffer capacity — an unstable sort made gradients differ at
    # ~1e-5 rel between tight and default bwd caps (round-5 test failure)
    gid_s, idx = jax.lax.sort(
        (gid, jnp.arange(r, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    rows_s = rows[idx]  # row gather, ~2 ns/row from a <=13 MB source
    # layout firewall: without it, the pallas operand's pinned layout
    # propagates THROUGH the gather/transpose into the whole backward
    # graph — XLA re-lays-out the projection/SH VJP chain at (G, 3, 16)
    # scale and the step regresses 9.99 -> 17.0 ms (round-5 trace bisect)
    rows_s, gid_s = jax.lax.optimization_barrier((rows_s, gid_s))
    nchunk = (num_out + cg - 1) // cg
    bounds = jnp.searchsorted(
        gid_s, jnp.arange(nchunk + 1, dtype=jnp.int32) * cg
    ).astype(jnp.int32)
    out = pl.pallas_call(
        _accum_kernel(cg, nchan, r // ROWBLK),
        grid=(nchunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((cg, nchan), lambda c: (c, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, nchan, ROWBLK), jnp.float32),
            pltpu.VMEM((2, 1, ROWBLK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((cg, nchan), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((nchunk * cg, nchan), jnp.float32),
        interpret=interpret,
    )(bounds,
      # channel-major blocks: the (1, nchan, ROWBLK) DMA slice is
      # lane-aligned (minor dim 128); row-major (ROWBLK, nchan) is not
      rows_s.reshape(r // ROWBLK, ROWBLK, nchan).transpose(0, 2, 1),
      gid_s.reshape(r // ROWBLK, 1, ROWBLK))
    return out[:num_out]
