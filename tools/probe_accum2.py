#!/usr/bin/env python
"""Round-4 accumulation probe at the v5/v6 culled row count (~250k rows).

The backward's final hop sums N per-pair (16,) f32 gradient rows onto
(G + 1, 16) keyed by gaussian id. Strategies:
  B  scatter-add f32 rows (current production path)
  B16 scatter-add bf16 rows (is scatter row- or byte-bound?)
  F  sort by gid + row gather + associative-scan cumsum + boundary diff
     (correct segmented version, no per-row scatter)
  G  pre-sorted gid order (binning could emit it): gather + scan + diff
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.profile_raster as _pr

_pr.STAGE_FILTER = []
timed_slope = _pr.timed_slope

import numpy as np
import jax
import jax.numpy as jnp

G = 100_000
NCH = 16
ROWS = 250_112  # ~ the culled backward demand (bwd_cap 1954 blocks * 128)


def segsum_sorted(rows, gs, g=G):
    """Segment sums of gid-sorted rows via cumsum + boundary diff; returns
    (g + 2, NCH). No per-row scatter: one cumsum, two small scatters of
    segment-boundary rows only."""
    cs = jnp.cumsum(rows, axis=0)
    nxt = jnp.concatenate([gs[1:], jnp.full((1,), jnp.int32(g + 1))])
    is_last = gs != nxt
    # T[g] = inclusive cumsum at g's last row; missing gids stay 0
    tbl = jnp.zeros((g + 2, NCH), rows.dtype).at[
        jnp.where(is_last, gs, g + 1)
    ].set(cs, mode="drop")
    pres = jnp.zeros((g + 2, 1), rows.dtype).at[
        jnp.where(is_last, gs, g + 1)
    ].set(jnp.ones((gs.shape[0], 1), rows.dtype), mode="drop")
    # L[g] = last present T before g (exclusive): carry scan over the table
    def comb(a, b):
        av, ap = a
        bv, bp = b
        return jnp.where(bp > 0, bv, av), jnp.maximum(ap, bp)
    lv, _ = jax.lax.associative_scan(comb, (tbl, pres), axis=0)
    prev = jnp.concatenate([jnp.zeros((1, NCH), rows.dtype), lv[:-1]], axis=0)
    return (tbl - jnp.where(pres > 0, prev, 0.0)) * (pres > 0)


def main():
    rng = np.random.default_rng(0)
    gid = jnp.asarray(
        np.where(
            rng.uniform(size=ROWS) < 0.9,
            rng.integers(0, G, size=ROWS),
            G,  # dead rows -> sentinel
        ).astype(np.int32)
    )
    rows = jnp.asarray(rng.normal(size=(ROWS, NCH)), jnp.float32)
    rows16 = rows.astype(jnp.bfloat16)
    gid_sorted = jnp.sort(gid)

    def b_scatter(i, rows, gid):
        out = jnp.zeros((G + 2, NCH), jnp.float32)
        out = out.at[jnp.minimum(gid + (i % 2), G + 1)].add(rows)
        return out[:, 0].sum()
    timed_slope("B  scatter-add 250k f32", b_scatter, big_args=(rows, gid))

    def b16_scatter(i, rows, gid):
        out = jnp.zeros((G + 2, NCH), jnp.float32)
        out = out.at[jnp.minimum(gid + (i % 2), G + 1)].add(
            rows.astype(jnp.float32))
        return out[:, 0].sum()
    timed_slope("B16 scatter-add 250k bf16 rows", b16_scatter,
                big_args=(rows16, gid))

    def f_sortscan(i, rows, gid):
        gs, order = jax.lax.sort(
            (jnp.minimum(gid + (i % 2), G + 1),
             jnp.arange(ROWS, dtype=jnp.int32)),
            num_keys=1,
        )
        rs = rows[order]
        seg = segsum_sorted(rs, gs)
        return seg[:, 0].sum()
    timed_slope("F  sort+gather+scan+diff 250k", f_sortscan,
                big_args=(rows, gid))

    def g_presorted(i, rows, gs):
        seg = segsum_sorted(rows + 1e-9 * i, gs)
        return seg[:, 0].sum()
    timed_slope("G  scan+diff only (pre-sorted)", g_presorted,
                big_args=(rows, gid_sorted))

    # correctness of segsum vs scatter on small case
    small_g = 777
    sg = jnp.sort(jnp.asarray(rng.integers(0, small_g, size=5000), jnp.int32))
    sr = jnp.asarray(rng.normal(size=(5000, NCH)), jnp.float32)
    ref = jnp.zeros((small_g + 2, NCH)).at[sg].add(sr)
    got = segsum_sorted(sr, sg, g=small_g)
    err = float(jnp.abs(ref - got).max())
    print(f"segsum correctness vs scatter: max err {err:.2e}")


if __name__ == "__main__":
    main()
