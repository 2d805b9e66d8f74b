#!/usr/bin/env python
"""Bisect the v2 grid_radius_search: run each stage at level-0 shapes on
TPU to find what crashes the worker."""

import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gaussreg_tpu.ops.neighbors import grid_radius_search, _count_below, _slab_gather_1d

B, M, N, CAP, LIMIT = 2, 30720, 30720, 128, 89


def main():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 3, size=(B, N, 3)), jnp.float32)
    msk = jnp.ones((B, N), bool)
    radius = 0.0625

    stage = sys.argv[1] if len(sys.argv) > 1 else "all"

    if stage in ("sort", "all"):
        @jax.jit
        def f_sort(p):
            c = jnp.clip(jnp.floor(p / radius).astype(jnp.int32), 0, 1023)
            key = (c[..., 0] << 20) | (c[..., 1] << 10) | c[..., 2]
            iota = jnp.arange(N, dtype=jnp.uint32)
            tb = jnp.broadcast_to(
                (iota * jnp.uint32(2654435761)).astype(jnp.int32), (B, N)
            )
            o0 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
            skey, _, order = jax.lax.sort((key, tb, o0), num_keys=2)
            return skey.sum() + order.sum()

        print("sort3:", int(f_sort(pts)), flush=True)

    if stage in ("count", "all"):
        @jax.jit
        def f_count(p):
            c = jnp.clip(jnp.floor(p / radius).astype(jnp.int32), 0, 1023)
            key = (c[..., 0] << 20) | (c[..., 1] << 10) | c[..., 2]
            skey = jax.lax.sort(key, dimension=1)
            chunk = 128
            nch = N // chunk
            skey_pad = jnp.concatenate(
                [skey, jnp.full((B, chunk), jnp.int32(0x7FFFFFFF))], axis=1
            )
            chmax = jnp.max(skey.reshape(B, nch, chunk), axis=-1)
            probes = jnp.broadcast_to(key[:, :M], (B, M))
            probes = jnp.concatenate([probes] * 9, axis=1)  # (B, 9M)
            r = _count_below(skey_pad, chmax, probes, chunk, strict=True)
            return r.sum()

        print("count:", int(f_count(pts)), flush=True)

    if stage in ("slab", "all"):
        @jax.jit
        def f_slab(p):
            plane = jnp.concatenate(
                [p[..., 0], jnp.full((B, CAP), 1e30, jnp.float32)], 1
            )
            starts = jnp.tile(
                jnp.arange(M, dtype=jnp.int32) % (N - CAP), (B, 9)
            ).reshape(B, M * 9)
            out = _slab_gather_1d(plane, starts, CAP)
            return out.sum()

        print("slab:", float(f_slab(pts)), flush=True)

    if stage in ("full", "all"):
        idx, of = grid_radius_search(
            pts, pts, msk, msk, radius, LIMIT, run_cap=CAP
        )
        print("full:", int(idx.sum()), "overflow", int(of), flush=True)


if __name__ == "__main__":
    main()
