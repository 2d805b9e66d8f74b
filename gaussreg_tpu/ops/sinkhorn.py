"""Log-domain Sinkhorn optimal transport with learnable dustbin (SuperGlue
style).

reference: geotransformer/modules/sinkhorn/learnable_sinkhorn.py:5-70. The
iteration loop is a `lax.scan` so the 100 iterations compile to a single
fused loop on device. `alpha` (the dustbin score) is passed in as a value so
the flax module owning it stays a thin wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = 1e12


@functools.partial(jax.jit, static_argnames=("num_iterations",))
def log_optimal_transport(
    scores: jnp.ndarray,
    row_masks: jnp.ndarray,
    col_masks: jnp.ndarray,
    alpha: jnp.ndarray,
    num_iterations: int = 100,
) -> jnp.ndarray:
    """Args:
        scores: (B, M, N) similarity scores.
        row_masks: (B, M) bool.
        col_masks: (B, N) bool.
        alpha: scalar learnable dustbin score.

    Returns:
        (B, M+1, N+1) log transport plan (reference learnable_sinkhorn.py:63-66).
    """
    b, m, n = scores.shape
    dtype = scores.dtype

    pad_row_invalid = jnp.concatenate(
        [~row_masks, jnp.zeros((b, 1), jnp.bool_)], axis=1
    )  # (B, M+1) True if padded/invalid
    pad_col_invalid = jnp.concatenate(
        [~col_masks, jnp.zeros((b, 1), jnp.bool_)], axis=1
    )
    score_invalid = pad_row_invalid[:, :, None] | pad_col_invalid[:, None, :]

    alpha = jnp.asarray(alpha, dtype)
    padded = jnp.concatenate(
        [scores, jnp.broadcast_to(alpha, (b, m, 1))], axis=2
    )
    padded = jnp.concatenate(
        [padded, jnp.broadcast_to(alpha, (b, 1, n + 1))], axis=1
    )
    padded = jnp.where(score_invalid, -_INF, padded)

    num_valid_row = jnp.sum(row_masks, axis=1).astype(dtype)
    num_valid_col = jnp.sum(col_masks, axis=1).astype(dtype)
    norm = -jnp.log(num_valid_row + num_valid_col)  # (B,)

    log_mu = jnp.concatenate(
        [
            jnp.broadcast_to(norm[:, None], (b, m)),
            (jnp.log(num_valid_col) + norm)[:, None],
        ],
        axis=1,
    )
    log_mu = jnp.where(pad_row_invalid, -_INF, log_mu)
    log_nu = jnp.concatenate(
        [
            jnp.broadcast_to(norm[:, None], (b, n)),
            (jnp.log(num_valid_row) + norm)[:, None],
        ],
        axis=1,
    )
    log_nu = jnp.where(pad_col_invalid, -_INF, log_nu)

    # rematerialized scan body: without checkpoint, backprop through the
    # iterations stores O(iters * B * M * N) logsumexp residuals (3+ GB at
    # production capacity); with it, only the (u, v) carries are saved
    @jax.checkpoint
    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(padded + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(padded + u[:, :, None], axis=1)
        return (u, v), None

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=num_iterations)

    out = padded + u[:, :, None] + v[:, None, :]
    return out - norm[:, None, None]
