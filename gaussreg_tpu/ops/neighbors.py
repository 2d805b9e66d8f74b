"""Fixed-capacity neighbor search (radius / knn) on device.

TPU-native replacement for the reference's nanoflann KD-tree radius search
(reference: geotransformer/extensions/cpu/radius_neighbors/radius_neighbors_cpu.cpp:36-91
and wrapper geotransformer/modules/ops/radius_search.py:7-27). Distances are
computed blockwise as gram matmuls on the MXU; the nearest `limit` support
points are kept with `lax.top_k` and masked by the radius. The reference
returns the first-found `limit` neighbors in KD-tree order; we return the
*nearest* `limit`, a strict quality superset with identical masking semantics
(sentinel index == num support slots, reference radius_search.py:25-27).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e12


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
    """Nearest `limit` support points within `radius` of each query.

    Returns (M, limit) int32 indices into s_points, sentinel == N for
    missing/invalid neighbors (N = s_points.shape[0]).
    """
    n = s_points.shape[0]
    d2, idx = _blocked_topk_dist(q_points, s_points, s_mask, limit, block)
    ok = (d2 <= radius * radius) & q_mask[:, None]
    return jnp.where(ok, idx, n).astype(jnp.int32)


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
