#!/usr/bin/env python
"""Pyramid + KPConv primitive probes on real TPU: where do 1.3 s (pyramid)
and 40 ms (neighbor gather) actually go, and what beats them?"""

import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_raster import timed_slope

M = 24576
N = 24576
K = 89
H = 89
C = 32
B = 2


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(0, 4, size=(M, 3)), jnp.float32)
    s = jnp.asarray(rng.uniform(0, 4, size=(N, 3)), jnp.float32)

    # --- d2 blocks alone (no selection)
    def d2_only(i, qq, ss):
        s2 = jnp.sum(ss * ss, axis=-1)

        def blk(qb):
            d2 = (
                jnp.sum(qb * qb, axis=-1)[:, None] - 2.0 * qb @ ss.T + s2[None, :]
            )
            return jnp.min(d2, axis=1)

        mins = jax.lax.map(blk, (qq + 1e-6 * i).reshape(-1, 1024, 3))
        return mins.sum()
    timed_slope("d2 blocks + row min (no topk)", d2_only, big_args=(q, s))

    # --- top_k inside blocks (current radius_search shape)
    def d2_topk(i, qq, ss):
        s2 = jnp.sum(ss * ss, axis=-1)

        def blk(qb):
            d2 = (
                jnp.sum(qb * qb, axis=-1)[:, None] - 2.0 * qb @ ss.T + s2[None, :]
            )
            neg, idx = jax.lax.top_k(-d2, K)
            return idx[:, 0].astype(jnp.float32) - neg[:, 0]

        r = jax.lax.map(blk, (qq + 1e-6 * i).reshape(-1, 1024, 3))
        return r.sum()
    timed_slope("d2 + lax.top_k(89) blocks", d2_topk, big_args=(q, s))

    # --- approx_max_k variant
    def d2_approx(i, qq, ss):
        s2 = jnp.sum(ss * ss, axis=-1)

        def blk(qb):
            d2 = (
                jnp.sum(qb * qb, axis=-1)[:, None] - 2.0 * qb @ ss.T + s2[None, :]
            )
            neg, idx = jax.lax.approx_max_k(-d2, K, recall_target=0.95)
            return idx[:, 0].astype(jnp.float32) - neg[:, 0]

        r = jax.lax.map(blk, (qq + 1e-6 * i).reshape(-1, 1024, 3))
        return r.sum()
    timed_slope("d2 + approx_max_k(89, r=.95)", d2_approx, big_args=(q, s))

    # --- threshold + cumsum compaction (radius semantics, no topk)
    def d2_thresh(i, qq, ss):
        s2 = jnp.sum(ss * ss, axis=-1)
        r2 = 0.0625 * 0.0625 * 6.25  # representative radius^2

        def blk(qb):
            d2 = (
                jnp.sum(qb * qb, axis=-1)[:, None] - 2.0 * qb @ ss.T + s2[None, :]
            )
            hit = d2 <= r2
            rank = jnp.cumsum(hit.astype(jnp.int32), axis=1)
            return (rank[:, -1]).astype(jnp.float32).sum() + d2[:, 0].sum()

        r = jax.lax.map(blk, (qq + 1e-6 * i).reshape(-1, 1024, 3))
        return r.sum()
    timed_slope("d2 + thresh + row cumsum", d2_thresh, big_args=(q, s))

    # --- neighbor feature gather variants (B, M, H) from (B, N, C)
    feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    nbr = jnp.asarray(
        np.minimum(
            rng.integers(0, N, size=(B, M, H))
            // 1,  # uniform random
            N,
        ),
        jnp.int32,
    )
    # Morton-local indices: idx approx equal to row index + small delta
    base = np.arange(M)[None, :, None] * (N // M)
    local = np.clip(base + rng.integers(-200, 200, size=(B, M, H)), 0, N - 1)
    nbr_local = jnp.asarray(local, jnp.int32)

    def g_vmap(i, f, ix):
        out = jax.vmap(lambda v, j: jnp.take(v, j, axis=0))(f + 1e-6 * i, ix)
        return out[:, :, 0, 0].sum() + out[:, :, -1, -1].sum()
    timed_slope("gather vmap-take uniform idx", g_vmap, big_args=(feats, nbr))
    timed_slope("gather vmap-take Morton-local idx", g_vmap,
                big_args=(feats, nbr_local))

    def g_flat(i, f, ix):
        ff = (f + 1e-6 * i).reshape(B * N, C)
        off = (jnp.arange(B, dtype=jnp.int32) * N)[:, None, None]
        out = ff[(ix + off).reshape(-1)]
        return out[:, 0].sum()
    timed_slope("gather flat single take", g_flat, big_args=(feats, nbr_local))

    def g_sorted(i, f, ix):
        # gather with fully sorted (iota-like) indices — upper bound
        ff = (f + 1e-6 * i).reshape(B * N, C)
        srt = jnp.sort(ix.reshape(-1) + 0)
        out = ff[srt]
        return out[:, 0].sum()
    timed_slope("gather pre-sorted idx (incl sort)", g_sorted,
                big_args=(feats, nbr_local))

    def g_takealong(i, f, ix):
        out = jnp.take_along_axis(
            (f + 1e-6 * i)[:, :, None, :], ix[..., None], axis=1
        )
        return out[:, :, 0, 0].sum()
    timed_slope("gather take_along_axis", g_takealong, big_args=(feats, nbr_local))


if __name__ == "__main__":
    main()
