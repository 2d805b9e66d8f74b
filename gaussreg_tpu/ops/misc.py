"""Small tensor ops completing the reference op library.

reference: geotransformer/modules/ops/index_select.py:4-31,
vector_angle.py:17-34.
"""

from __future__ import annotations

import jax.numpy as jnp


def index_select(values: jnp.ndarray, indices: jnp.ndarray, axis: int = 0):
    """N-d gather generalizing torch.index_select: output shape =
    values.shape[:axis] + indices.shape + values.shape[axis+1:]
    (reference index_select.py:4-31)."""
    return jnp.take(values, indices, axis=axis)


def vector_angle(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Angle between vectors via atan2(|a x b|, a.b) — numerically stable
    for near-parallel vectors (reference vector_angle.py:17-34)."""
    cross = jnp.cross(a, b)
    sin = jnp.linalg.norm(cross, axis=-1)
    cos = jnp.sum(a * b, axis=-1)
    return jnp.arctan2(sin, cos)


def deg2rad(x):
    return x * jnp.pi / 180.0


def rad2deg(x):
    return x * 180.0 / jnp.pi
