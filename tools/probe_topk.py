#!/usr/bin/env python
"""Honest top-k cost on TPU (consume ALL outputs — earlier probes were
DCE'd to top-1). Decides the pyramid neighbor-search redesign."""

import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_raster import timed_slope


def main():
    rng = np.random.default_rng(0)

    for rows, n, k in [
        (24576, 24576, 89),   # current level-0 shape
        (131072, 864, 89),    # grid-pruned candidates
        (131072, 256, 89),
        (24576, 24576, 30),
    ]:
        x = jnp.asarray(rng.normal(size=(rows, n)), jnp.float32)

        def topk(i, xx):
            blocks = (xx + 1e-6 * i).reshape(-1, 1024, n)

            def blk(b):
                v, idx = jax.lax.top_k(b, k)
                return v.sum() + (idx % 7).sum().astype(jnp.float32)

            return jax.lax.map(blk, blocks).sum()
        timed_slope(f"top_k rows={rows} n={n} k={k} (full)", topk,
                    big_args=(x,), r_lo=1, r_hi=3)

        if n <= 1024:
            def sortsel(i, xx):
                blocks = (xx + 1e-6 * i).reshape(-1, 4096, n)

                def blk(b):
                    idx = jnp.broadcast_to(
                        jnp.arange(n, dtype=jnp.int32)[None], b.shape
                    )
                    sv, si = jax.lax.sort((b, idx), num_keys=1)
                    return sv[:, :k].sum() + (si[:, :k] % 7).sum().astype(jnp.float32)

                return jax.lax.map(blk, blocks).sum()
            timed_slope(f"sort-select rows={rows} n={n} k={k}", sortsel,
                        big_args=(x,), r_lo=1, r_hi=3)

    # variadic sort along minor dim at level-0 scale for reference
    x = jnp.asarray(rng.normal(size=(4096, 24576)), jnp.float32)

    def bigsort(i, xx):
        sv = jnp.sort(xx + 1e-6 * i, axis=-1)
        return sv[:, :89].sum()
    timed_slope("full row sort rows=4096 n=24576", bigsort, big_args=(x,),
                r_lo=1, r_hi=2)


if __name__ == "__main__":
    main()
