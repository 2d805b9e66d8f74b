"""Fixed-capacity neighbor search (radius / knn) on device.

TPU-native replacement for the reference's nanoflann KD-tree radius search
(reference: geotransformer/extensions/cpu/radius_neighbors/radius_neighbors_cpu.cpp:36-91
and wrapper geotransformer/modules/ops/radius_search.py:7-27). nanoflann is
run with `sorted = true` (radius_neighbors_cpu.cpp:34), so the reference
returns the *nearest* `limit` within the radius — exactly what both paths
here produce, with identical sentinel semantics (sentinel index == num
support slots, reference radius_search.py:25-27).

Two exact implementations:

- brute force: blockwise gram-matmul distances + `lax.top_k` over the full
  support width. Simple, but `top_k` on TPU costs ~rows x n x k — 270 ms at
  level-0 pyramid width (measured, PERF.md).
- grid-run pruned (`grid_radius_search`, the default for large supports):
  supports are sorted by a linear cell key (cell == radius, z in the low
  bits) so each query's 27-cell neighborhood is NINE contiguous z-runs.
  Per query: 9 searchsorted range probes, one slab gather of the runs
  (capped at `run_cap`, overflow counted), masked distances, and a top_k
  over ~500 candidates instead of the full support. ~25x faster at pyramid
  scale, bit-identical output when no run overflows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e12
_BITS = 10  # cell coords in [0, 1024); linear key x<<20 | y<<10 | z


def _blocked_topk_dist(q_points, s_points, s_mask, k: int, block: int):
    """Return (sq_dists, indices) of the k nearest valid support points for
    every query row. Shapes: q (M, 3), s (N, 3) -> (M, k) each."""
    m = q_points.shape[0]
    pad = (-m) % block
    q = jnp.pad(q_points, ((0, pad), (0, 0)))
    s2 = jnp.sum(s_points * s_points, axis=-1)
    s2 = jnp.where(s_mask, s2, _BIG)

    def one_block(qb):
        d2 = (
            jnp.sum(qb * qb, axis=-1)[:, None]
            - 2.0 * qb @ s_points.T
            + s2[None, :]
        )
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    qb = q.reshape(-1, block, 3)
    d2, idx = jax.lax.map(one_block, qb)
    d2 = d2.reshape(-1, k)[:m]
    idx = idx.reshape(-1, k)[:m]
    return jnp.maximum(d2, 0.0), idx


@functools.partial(jax.jit, static_argnames=("limit", "block"))
def radius_search(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    q_mask: jnp.ndarray,
    s_mask: jnp.ndarray,
    radius,
    limit: int,
    block: int = 1024,
) -> jnp.ndarray:
    """Nearest `limit` support points within `radius` of each query
    (brute-force path).

    Returns (M, limit) int32 indices into s_points, sentinel == N for
    missing/invalid neighbors (N = s_points.shape[0]).
    """
    n = s_points.shape[0]
    d2, idx = _blocked_topk_dist(q_points, s_points, s_mask, limit, block)
    ok = (d2 <= radius * radius) & q_mask[:, None]
    return jnp.where(ok, idx, n).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("limit", "run_cap")
)
def grid_radius_search(
    q_points: jnp.ndarray,  # (B, M, 3)
    s_points: jnp.ndarray,  # (B, N, 3)
    q_mask: jnp.ndarray,  # (B, M)
    s_mask: jnp.ndarray,  # (B, N)
    radius,
    limit: int,
    run_cap: int = 96,
):
    """Batched grid-run pruned radius search (module docstring).

    Returns (indices (B, M, limit) int32 with sentinel == N,
             overflow () int32 — candidate z-runs longer than run_cap;
             > 0 means some in-radius neighbors may have been missed and
             run_cap should be raised).
    """
    b, m = q_points.shape[:2]
    n = s_points.shape[1]
    r2 = radius * radius

    big = jnp.asarray(jnp.finfo(s_points.dtype).max, s_points.dtype)
    pmin = jnp.min(
        jnp.where(s_mask[..., None], s_points, big), axis=1, keepdims=True
    )  # (B, 1, 3)

    def cellify(pts):
        return jnp.clip(
            jnp.floor((pts - pmin) / radius).astype(jnp.int32),
            0,
            (1 << _BITS) - 1,
        )

    s_cells = cellify(s_points)
    key = (
        (s_cells[..., 0] << (2 * _BITS))
        | (s_cells[..., 1] << _BITS)
        | s_cells[..., 2]
    )
    key = jnp.where(s_mask, key, jnp.int32(0x7FFFFFFF))  # invalid sort last
    order = jnp.argsort(key, axis=1)  # (B, N)
    skey = jnp.take_along_axis(key, order, axis=1)
    spts = jnp.take_along_axis(s_points, order[..., None], axis=1)
    # padding rows -> far away so their d2 can never pass the radius test
    svalid = jnp.take_along_axis(s_mask, order, axis=1)
    spts = jnp.where(svalid[..., None], spts, big)

    # per query: 9 z-runs, one per (dx, dy) in the 3x3 xy-neighborhood
    q_cells = cellify(q_points)  # (B, M, 3)
    dxy = jnp.stack(
        jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"),
        axis=-1,
    ).reshape(9, 2)  # (9, 2)
    cx = jnp.clip(q_cells[..., 0:1] + dxy[:, 0], 0, (1 << _BITS) - 1)
    cy = jnp.clip(q_cells[..., 1:2] + dxy[:, 1], 0, (1 << _BITS) - 1)
    z0 = jnp.maximum(q_cells[..., 2:3] - 1, 0)
    z1 = jnp.minimum(q_cells[..., 2:3] + 1, (1 << _BITS) - 1)
    lo_key = (cx << (2 * _BITS)) | (cy << _BITS) | z0  # (B, M, 9)
    hi_key = (cx << (2 * _BITS)) | (cy << _BITS) | z1

    starts = jax.vmap(jnp.searchsorted, in_axes=(0, 0))(
        skey, lo_key.reshape(b, -1)
    ).reshape(b, m, 9)
    ends = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"))(
        skey, hi_key.reshape(b, -1)
    ).reshape(b, m, 9)
    lengths = ends - starts
    overflow = jnp.sum(jnp.maximum(lengths - run_cap, 0))

    # SLAB gather: one (run_cap, 3) contiguous slice per (query, run) — 9*M
    # slab rows per cloud instead of 9*M*run_cap scalar rows (a per-slot row
    # gather here would cost ~70 ms; slabs amortize the per-row gather cost)
    offs = jnp.arange(run_cap, dtype=jnp.int32)
    cand = starts[..., None] + offs  # (B, M, 9, run_cap) sorted-order rows
    cand_valid = offs < jnp.minimum(lengths, run_cap)[..., None]

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )
    pad = jnp.full((run_cap, 3), big, spts.dtype)

    def slab_gather(sp_b, starts_b):
        return jax.lax.gather(
            jnp.concatenate([sp_b, pad], axis=0),  # starts never clip
            starts_b.reshape(-1, 1),
            dnums,
            slice_sizes=(run_cap, 3),
        ).reshape(m, 9, run_cap, 3)

    cpts = jnp.stack(
        [slab_gather(spts[i], starts[i]) for i in range(b)]
    )  # (B, M, 9, run_cap, 3)

    d2 = jnp.sum((cpts - q_points[:, :, None, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand_valid, d2, _BIG).reshape(b, m, 9 * run_cap)
    neg, slot = jax.lax.top_k(-d2, limit)  # (B, M, limit)
    d2_sel = -neg
    picked = jnp.take_along_axis(
        cand.reshape(b, m, 9 * run_cap), slot, axis=-1
    )  # rows in sorted order
    idx = jnp.take_along_axis(
        order, jnp.minimum(picked, n - 1).reshape(b, -1), axis=1
    ).reshape(b, m, limit)  # back to original support ids
    ok = (d2_sel <= r2) & q_mask[:, :, None]
    return jnp.where(ok, idx, n).astype(jnp.int32), overflow


@functools.partial(jax.jit, static_argnames=("k", "block"))
def knn_search(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    q_mask: jnp.ndarray,
    s_mask: jnp.ndarray,
    k: int,
    block: int = 1024,
):
    """k nearest valid support points per query.

    Returns (indices (M, k) int32 with sentinel N, sq_dists (M, k)).
    Invalid queries get all-sentinel rows.
    """
    n = s_points.shape[0]
    d2, idx = _blocked_topk_dist(q_points, s_points, s_mask, k, block)
    ok = (d2 < _BIG / 2) & q_mask[:, None]
    return jnp.where(ok, idx, n).astype(jnp.int32), d2


def gather_padded(values: jnp.ndarray, indices: jnp.ndarray, fill=0.0) -> jnp.ndarray:
    """Gather rows of `values` (N, ...) at `indices` (...,) where sentinel
    index == N returns `fill` (the reference emulates this by concatenating a
    zero/inf row, e.g. modules/kpconv/kpconv.py:91,103)."""
    n = values.shape[0]
    clipped = jnp.minimum(indices, n - 1)
    out = jnp.take(values, clipped, axis=0)
    sentinel = (indices == n).reshape(indices.shape + (1,) * (values.ndim - 1))
    return jnp.where(sentinel, jnp.asarray(fill, values.dtype), out)
