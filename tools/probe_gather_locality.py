#!/usr/bin/env python
"""How does TPU row-gather speed depend on source size and index locality?

Decides whether Morton-ordering tile segments (clustering each gaussian's
pair positions) can cut the rasterizer's gradient-accumulation gather.
"""

import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from tools.profile_raster import timed_slope

N_IDX = 1_600_000
NCH = 16


def main():
    rng = np.random.default_rng(0)

    for src_mb in (13, 27, 54, 107):
        rows = src_mb * 1_000_000 // (NCH * 4)
        src = jnp.asarray(rng.normal(size=(rows, NCH)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, rows, size=N_IDX), jnp.int32)

        def g(i, s, ix):
            return s[jnp.minimum(ix + (i % 2), s.shape[0] - 1)][:, 0].sum()
        timed_slope(f"gather 1.6M rows, src {src_mb} MB uniform", g,
                    big_args=(src, idx))

    # locality: indices clustered in windows (107 MB source)
    rows = 107 * 1_000_000 // (NCH * 4)
    src = jnp.asarray(rng.normal(size=(rows, NCH)), jnp.float32)
    for win_rows, label in ((16_384, "1MB"), (131_072, "8MB"), (1_048_576, "64MB")):
        base = rng.integers(0, max(rows - win_rows, 1), size=N_IDX // 16)
        idx = (np.repeat(base, 16) + rng.integers(0, win_rows, size=N_IDX)).astype(np.int32)
        idx = np.minimum(idx, rows - 1)
        idx_j = jnp.asarray(idx)

        def g(i, s, ix):
            return s[jnp.minimum(ix + (i % 2), s.shape[0] - 1)][:, 0].sum()
        timed_slope(f"gather 1.6M rows, {label} windows", g, big_args=(src, idx_j))

    # row-count scaling at 107 MB
    idx8 = jnp.asarray(rng.integers(0, rows, size=N_IDX // 2), jnp.int32)
    def g8(i, s, ix):
        return s[jnp.minimum(ix + (i % 2), s.shape[0] - 1)][:, 0].sum()
    timed_slope("gather 0.8M rows, src 107 MB uniform", g8, big_args=(src, idx8))


if __name__ == "__main__":
    main()
