"""Pairwise squared distances, MXU-friendly (gram-matrix form).

reference: geotransformer/modules/ops/pairwise_distance.py:4-31.
"""

from __future__ import annotations

import jax.numpy as jnp

_BIG = 1e12


def pairwise_sq_dist(
    x: jnp.ndarray, y: jnp.ndarray, normalized: bool = False
) -> jnp.ndarray:
    """Squared euclidean distance between (..., N, C) and (..., M, C).

    Uses |x|^2 - 2 x.y + |y|^2 (a single matmul on the MXU); when `normalized`
    (unit-norm features) uses the faster 2 - 2 x.y
    (reference: pairwise_distance.py:22-29). Clamped at 0 to absorb the
    round-off that the gram form introduces.
    """
    xy = jnp.einsum("...nc,...mc->...nm", x, y)
    if normalized:
        sq = 2.0 - 2.0 * xy
    else:
        x2 = jnp.sum(x * x, axis=-1)[..., :, None]
        y2 = jnp.sum(y * y, axis=-1)[..., None, :]
        sq = x2 - 2.0 * xy + y2
    return jnp.maximum(sq, 0.0)


def masked_pairwise_sq_dist(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_mask: jnp.ndarray | None = None,
    y_mask: jnp.ndarray | None = None,
    fill: float = _BIG,
) -> jnp.ndarray:
    """pairwise_sq_dist with invalid rows/cols filled with `fill`."""
    sq = pairwise_sq_dist(x, y)
    if x_mask is not None:
        sq = jnp.where(x_mask[..., :, None], sq, fill)
    if y_mask is not None:
        sq = jnp.where(y_mask[..., None, :], sq, fill)
    return sq
