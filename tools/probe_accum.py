#!/usr/bin/env python
"""Microbenchmark gradient-accumulation strategies on real TPU.

Candidates for summing 1.6M per-pair (16,) gradient rows onto 100k
gaussians (the rasterizer backward's final hop):
  A. pos-table gather from the big private buffer + slot sum (current)
  B. scatter-add rows at sorted_gid into the small (G+1, 16) table
  C. gather from a bf16 source
  D. scatter-add with fewer rows (tighter pair capacity)
"""

import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_raster import timed_slope

G = 100_000
MT = 16
CAP = 1_600_000  # pair capacity (elements)
NCH = 16


def main():
    rng = np.random.default_rng(0)
    num_tiles = 600
    priv_cap = CAP + num_tiles * 128

    # realistic pos table: ~55% of slots valid, positions roughly sorted by
    # tile for low-index slots
    pos = np.full((G, MT), priv_cap, np.int32)
    counts = np.minimum(rng.geometric(0.18, size=G), MT)
    perm = rng.permutation(CAP)
    k = 0
    for g in range(0, G, 997):  # only fill a sample pattern cheaply
        pass
    # vectorized fill: assign random distinct positions per row
    mask = np.arange(MT)[None, :] < counts[:, None]
    nvalid = int(mask.sum())
    pos[mask] = perm[:nvalid] if nvalid <= CAP else perm[np.arange(nvalid) % CAP]
    pos_j = jnp.asarray(pos)

    sorted_gid = np.full(CAP, G, np.int32)
    sorted_gid[: nvalid] = rng.integers(0, G, size=nvalid)
    sorted_gid_j = jnp.asarray(np.sort(rng.permutation(sorted_gid)))  # arbitrary
    sorted_gid_j = jnp.asarray(sorted_gid)

    grows_f32 = jnp.asarray(rng.normal(size=(priv_cap + 1, NCH)), jnp.float32)
    grows_bf16 = grows_f32.astype(jnp.bfloat16)
    rows_cap_f32 = jnp.asarray(rng.normal(size=(CAP, NCH)), jnp.float32)
    rows_cap_bf16 = rows_cap_f32.astype(jnp.bfloat16)

    print(f"valid rows: {nvalid} of table {G}x{MT}, cap {CAP}")

    def a_gather(i, gr, p):
        picked = gr[jnp.minimum(p + (i % 2), gr.shape[0] - 1)]  # (G, MT, NCH)
        return jnp.sum(picked, axis=1)[:, 0].sum()
    timed_slope("A gather f32 107MB + slot sum", a_gather,
                big_args=(grows_f32, pos_j))

    def c_gather(i, gr, p):
        picked = gr[jnp.minimum(p + (i % 2), gr.shape[0] - 1)].astype(jnp.float32)
        return jnp.sum(picked, axis=1)[:, 0].sum()
    timed_slope("C gather bf16 54MB + slot sum", c_gather,
                big_args=(grows_bf16, pos_j))

    def b_scatter(i, rows, gid):
        out = jnp.zeros((G + 1, NCH), jnp.float32)
        out = out.at[jnp.minimum(gid + (i % 2), G)].add(rows)
        return out[:, 0].sum()
    timed_slope("B scatter-add 1.6M f32 rows", b_scatter,
                big_args=(rows_cap_f32, sorted_gid_j))

    def b2_scatter(i, rows, gid):
        out = jnp.zeros((G + 1, NCH), jnp.float32)
        out = out.at[jnp.minimum(gid + (i % 2), G)].add(rows.astype(jnp.float32))
        return out[:, 0].sum()
    timed_slope("B2 scatter-add 1.6M bf16 rows", b2_scatter,
                big_args=(rows_cap_bf16, sorted_gid_j))

    half = CAP // 2
    def d_scatter(i, rows, gid):
        out = jnp.zeros((G + 1, NCH), jnp.float32)
        out = out.at[jnp.minimum(gid[:half] + (i % 2), G)].add(rows[:half])
        return out[:, 0].sum()
    timed_slope("D scatter-add 0.8M f32 rows", d_scatter,
                big_args=(rows_cap_f32, sorted_gid_j))

    # E: segment-sum via one-hot matmul over 128-chunks in gid order:
    # rows sorted by gid -> per 128-gaussian chunk contiguous segments.
    # Emulate: sorted gid + blocked matmul accumulation.
    gid_sorted = jnp.sort(sorted_gid_j)
    def e_onehot(i, rows, gid):
        # dense one-hot matmul in 2048-row strips: (G+1) x strip one-hot
        # too big; skip — placeholder comparing plain segment_sum
        out = jax.ops.segment_sum(rows, gid + (i % 2), num_segments=G + 1)
        return out[:, 0].sum()
    timed_slope("E segment_sum (sorted gid)", e_onehot,
                big_args=(rows_cap_f32, gid_sorted))

    # F: sort + cumsum-diff at the CULLED row count (~300k rows — the v5
    # saturation-compacted backward): sort gids w/ row-index payload,
    # gather rows into gid order, inclusive associative-scan cumsum, take
    # per-segment last rows, adjacent-diff, one scatter of <= distinct-gid
    # rows. Every stage is sort/gather/scan — no per-index scatter floor
    # except the final small unique-index scatter.
    rcap = 300_032
    rows_small = rows_cap_f32[:rcap]
    gid_small = sorted_gid_j[:rcap]
    def f_sortscan(i, rows, gid):
        gid = jnp.minimum(gid + (i % 2), G)
        gs, order = jax.lax.sort(
            (gid, jnp.arange(rcap, dtype=jnp.int32)), num_keys=1
        )
        rs = rows[order]  # (rcap, NCH) gather into gid order
        cs = jax.lax.associative_scan(jnp.add, rs, axis=0)
        # segment last rows: positions where the NEXT gid differs
        nxt = jnp.concatenate([gs[1:], jnp.full((1,), -1, gs.dtype)])
        is_last = gs != nxt
        # per-position exclusive prefix: value at last pos minus value at
        # previous segment's last pos
        prev_last = jnp.concatenate(
            [jnp.zeros((1, NCH), cs.dtype), jnp.where(is_last[:-1, None], cs[:-1], 0)]
        )
        # running max of previous-last via scan over masked rows is
        # overkill: segment sums = cs[last] - cs[prev_last_pos]; compute by
        # scatter of cs[last] keyed by gid then adjacent handling — here
        # emulate with two scatters of ~distinct rows
        out = jnp.zeros((G + 2, NCH), jnp.float32)
        out = out.at[jnp.where(is_last, gs, G + 1)].set(cs, mode="drop")
        shifted = jnp.zeros((G + 2, NCH), jnp.float32)
        shifted = shifted.at[
            jnp.where(is_last, jnp.minimum(gs + 1, G + 1), G + 1)
        ].set(cs, mode="drop")
        # out[g] - (cumsum at previous segment end) needs segment ORDER not
        # gid adjacency; correct when every gid in [0, G] occurs (dense) —
        # bench-probe approximation for timing purposes
        seg = out[:G + 1] - shifted[:G + 1]
        return seg[:, 0].sum()
    timed_slope("F sort+scan+diff 300k rows (v5 culled)", f_sortscan,
                big_args=(rows_small, gid_small))

    def b3_scatter(i, rows, gid):
        out = jnp.zeros((G + 1, NCH), jnp.float32)
        out = out.at[jnp.minimum(gid + (i % 2), G)].add(rows)
        return out[:, 0].sum()
    timed_slope("B3 scatter-add 300k f32 rows (v5 culled baseline)",
                b3_scatter, big_args=(rows_small, gid_small))


if __name__ == "__main__":
    main()
