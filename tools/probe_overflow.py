#!/usr/bin/env python
"""Quantify capacity/search overflow across synthetic pairs.

Checks whether the vox_overflow counter seen in training logs corresponds to
actual degradation: per-level true voxel counts vs capacities, the grid-run
search_overflow entry count, and — the ground truth that matters — neighbor
list recall vs an exact brute-force radius search, for BOTH clouds of the
pair and for the cross-level subsampling searches (all of which contribute
to search_overflow; data/pipeline.py:96-127).

Recall comparison is done on distance values with a float32-epsilon
tolerance, not strict index membership: equidistant points at the k-th
boundary or round-off near radius^2 are not real misses.

Run on CPU: python tools/probe_overflow.py [--seeds 0 1 2 ...]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the axon sitecustomize pre-imports jax with JAX_PLATFORMS=axon baked into
# the live config — a plain env default is NOT enough to stay off the chip
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def _recall(pts_q, msk_q, pts_s, msk_s, nbr, radius):
    """Distance-multiset recall of a padded neighbor list vs brute force.

    A neighbor list entry is correct if its distance is within eps of some
    true neighbor distance; the list may keep any `limit`-subset of the true
    neighbors provided it keeps the nearest ones (up to distance ties)."""
    n_s = pts_s.shape[0]
    limit = nbr.shape[1]
    q_idx = np.where(msk_q)[0]
    d2 = ((pts_q[q_idx][:, None] - pts_s[None]) ** 2).sum(-1)
    r2 = radius * radius
    eps = 1e-6 + 1e-4 * r2
    inball = (d2 <= r2 + eps) & msk_s[None, :]
    missing = total = truncated_true = 0
    for i, qi in enumerate(q_idx):
        exact = np.where(inball[i])[0]
        got = nbr[qi][nbr[qi] < n_s]
        k = min(len(exact), limit)
        if k == 0:
            continue
        exact_d = np.sort(d2[i][exact])[:k]
        got_d = np.sort(d2[i][got]) if got.size else np.empty(0)
        # k-th-distance tolerant: every exact distance strictly below the
        # k-th got distance (minus eps) that has no counterpart is a miss
        miss = 0
        j = 0
        for ed in exact_d:
            while j < got_d.size and got_d[j] < ed - eps:
                j += 1
            if j < got_d.size and abs(got_d[j] - ed) <= eps:
                j += 1
            elif got_d.size and ed >= got_d[-1] - eps:
                pass  # beyond the list's k-th distance: a valid truncation
            else:
                miss += 1
        missing += miss
        total += k
        if len(exact) > limit:
            truncated_true += 1
    return missing, total, truncated_true, len(q_idx)


def probe_pair(cfg, seed, sample=512, quiet=False):
    from gaussreg_tpu.data.pipeline import make_pair_batch
    from gaussreg_tpu.data.synthetic import random_pair

    pb = make_pair_batch(cfg, *random_pair(cfg, seed))
    pyr = pb.pyramid
    overflow = int(pyr.search_overflow)
    if not quiet:
        print(f"--- seed {seed}: search_overflow={overflow}")
        for lvl, (nv, cap) in enumerate(zip(pyr.num_voxels, cfg.capacity.levels)):
            print(f"  level {lvl}: num_voxels={np.asarray(nv)} capacity={cap}")

    rng = np.random.default_rng(0)
    results = []
    radius = cfg.backbone.init_radius
    for lvl in range(len(cfg.capacity.levels)):
        for b, name in ((0, "ref"), (1, "src")):
            pts = np.asarray(pyr.points[lvl][b])
            msk = np.asarray(pyr.masks[lvl][b]).copy()
            # sample queries to keep brute force tractable
            valid = np.where(msk)[0]
            if valid.size > sample:
                keep = rng.choice(valid, size=sample, replace=False)
                qm = np.zeros_like(msk)
                qm[keep] = True
            else:
                qm = msk
            miss, tot, trunc, nq = _recall(
                pts, qm, pts, msk, np.asarray(pyr.neighbors[lvl][b]), radius
            )
            rec = 1 - miss / max(tot, 1)
            results.append((f"L{lvl}/{name}/self", rec, miss, tot, trunc, nq))
            # subsampling search: queries = level lvl+1 points
            if lvl < len(cfg.capacity.levels) - 1:
                pts_q = np.asarray(pyr.points[lvl + 1][b])
                msk_q = np.asarray(pyr.masks[lvl + 1][b]).copy()
                vq = np.where(msk_q)[0]
                if vq.size > sample:
                    keep = rng.choice(vq, size=sample, replace=False)
                    qm2 = np.zeros_like(msk_q)
                    qm2[keep] = True
                else:
                    qm2 = msk_q
                miss, tot, trunc, nq = _recall(
                    pts_q, qm2, pts, msk,
                    np.asarray(pyr.subsampling[lvl][b]), radius,
                )
                rec = 1 - miss / max(tot, 1)
                results.append((f"L{lvl}/{name}/sub", rec, miss, tot, trunc, nq))
        radius *= 2.0
    if not quiet:
        for name, rec, miss, tot, trunc, nq in results:
            print(
                f"  {name:14s} recall={rec:.4f} ({miss}/{tot} missing), "
                f"queries with >limit true neighbors: {trunc}/{nq}"
            )
    return overflow, results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="*", default=[12345, 0, 3, 7])
    ap.add_argument("--sample", type=int, default=512)
    args = ap.parse_args()

    from gaussreg_tpu.config import make_cfg

    cfg = make_cfg()
    worst = 1.0
    for seed in args.seeds:
        overflow, results = probe_pair(cfg, seed, sample=args.sample)
        worst = min(worst, min(r[1] for r in results))
    print(f"worst recall across seeds/levels/clouds: {worst:.4f}")


if __name__ == "__main__":
    main()
