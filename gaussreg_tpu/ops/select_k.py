"""Exact k-smallest selection as a Pallas TPU kernel.

Why this exists: `jax.lax.top_k` on TPU lowers to a full stable variadic
sort with an iota payload — at the pyramid's level-0 search shapes
((2, 30720, 9, 256) f32) one such sort costs ~190 ms on a v5e chip and the
two-stage top_k structure in `ops/neighbors.py` paid it at every pyramid
level (device trace: 1.22 s of pure sort per build_pyramid call,
tools/trace_pyramid.py, PERF.md round 4). Selection of k ≪ W needs no
sort at all: this kernel extracts the row-wise minimum k times from a
VMEM-resident block using only VPU min/where passes — no cross-lane
shuffles, no sort network. Everything stays rank-2: Mosaic's layout
inference aborts on rank-changing reshapes of size-1 dims.

Semantics match `lax.top_k(-d2, k)` exactly: values ascending, ties broken
by the smaller flat index (top_k is stable in index order).

Reference twin: the selection step of the nanoflann radius search
(reference geotransformer/extensions/cpu/radius_neighbors/radius_neighbors_cpu.cpp:36-91
returns the nearest `limit` sorted); here it is a batched device kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BIG_F = float(jnp.finfo(jnp.float32).max)
_BIG_I = 2**30


def _select_kernel(k: int, kpad: int):
    def kernel(x_ref, vals_ref, pos_ref):
        x = x_ref[...]  # (BR, W) f32
        br, w = x.shape
        # flat candidate position — positional min == smallest flat index
        gpos = jax.lax.broadcasted_iota(jnp.int32, (br, w), 1)
        ji = jax.lax.broadcasted_iota(jnp.int32, (br, kpad), 1)

        def body(j, carry):
            x, vals, pos = carry
            m = jnp.min(x, axis=1, keepdims=True)  # (BR, 1)
            cand = jnp.where(x == m, gpos, _BIG_I)
            p = jnp.min(cand, axis=1, keepdims=True)  # (BR, 1)
            vals = jnp.where(ji == j, m, vals)  # (BR, kpad)
            pos = jnp.where(ji == j, p, pos)
            x = jnp.where(gpos == p, _BIG_F, x)
            return x, vals, pos

        vals0 = jnp.full((br, kpad), _BIG_F, jnp.float32)
        pos0 = jnp.full((br, kpad), _BIG_I, jnp.int32)
        _, vals, pos = jax.lax.fori_loop(0, k, body, (x, vals0, pos0))
        vals_ref[...] = vals
        pos_ref[...] = pos

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "interpret")
)
def select_min_k(
    d2: jnp.ndarray, k: int, block_rows: int = 128, interpret: bool = False
):
    """Row-wise k smallest of `d2` (R, W) f32, W a multiple of 128.

    Returns (vals (R, k) ascending, pos (R, k) int32 flat positions).
    Exact: identical to full-sort selection with stable tie-breaks.
    Rows are processed in VMEM blocks of `block_rows`; R is padded up.

    Precondition: inputs must be < finfo(f32).max and not NaN — the kernel
    marks eliminated candidates in-band with finfo max, so rows containing
    that value (or +inf/NaN, which compare unlike top_k) lose the exact
    lax.top_k index parity. Callers use finite sentinels (e.g. 1e12 in
    ops/neighbors.py) for padding.
    """
    r, w = d2.shape
    assert w % 128 == 0, w
    assert k <= w
    kpad = ((k + 127) // 128) * 128  # lane-width multiple holding k
    pad = (-r) % block_rows
    if pad:
        d2 = jnp.pad(d2, ((0, pad), (0, 0)), constant_values=_BIG_F)
    rp = d2.shape[0]
    grid = (rp // block_rows,)
    vals, pos = pl.pallas_call(
        _select_kernel(k, kpad),
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, w), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((block_rows, kpad), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, kpad), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, kpad), jnp.float32),
            jax.ShapeDtypeStruct((rp, kpad), jnp.int32),
        ],
        interpret=interpret,
    )(d2)
    return vals[:r, :k], pos[:r, :k]
