#!/usr/bin/env python
"""Quantify capacity/search overflow on a full-capacity synthetic pair.

Checks whether the vox_overflow counter seen in training logs corresponds to
actual degradation: per-level true voxel counts vs capacities, the grid-run
search_overflow entry count, and — the ground truth that matters — level-0
neighbor-list recall vs an exact brute-force radius search.

Run on CPU: JAX_PLATFORMS=cpu python tools/probe_overflow.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gaussreg_tpu.config import make_cfg
from gaussreg_tpu.data.pipeline import make_pair_batch
from gaussreg_tpu.data.synthetic import random_pair


def main():
    cfg = make_cfg()
    rp, rf, sp, sf, m = random_pair(cfg, 12345)
    pb = make_pair_batch(cfg, rp, rf, sp, sf, m)
    pyr = pb.pyramid
    print("search_overflow:", int(pyr.search_overflow))
    for lvl, (nv, cap) in enumerate(zip(pyr.num_voxels, cfg.capacity.levels)):
        print(f"level {lvl}: num_voxels={np.asarray(nv)} capacity={cap}")

    # exact recall at each level, sampled queries
    rng = np.random.default_rng(0)
    radius = cfg.backbone.init_radius
    for lvl in range(len(cfg.capacity.levels)):
        pts = np.asarray(pyr.points[lvl][0])
        msk = np.asarray(pyr.masks[lvl][0])
        nbr = np.asarray(pyr.neighbors[lvl][0])
        n = pts.shape[0]
        valid = np.where(msk)[0]
        q = rng.choice(valid, size=min(512, valid.size), replace=False)
        d2 = ((pts[q][:, None] - pts[None])**2).sum(-1)
        inball = (d2 <= radius * radius) & msk[None, :]
        limit = nbr.shape[1]
        missing = 0
        total = 0
        truncated_true = 0
        for i, qi in enumerate(q):
            exact = np.where(inball[i])[0]
            got = set(nbr[qi][nbr[qi] < n].tolist())
            k = min(len(exact), limit)
            # the list is allowed to keep only the nearest `limit`
            order = exact[np.argsort(d2[i][exact])][:k]
            miss = sum(1 for e in order if e not in got)
            missing += miss
            total += k
            if len(exact) > limit:
                truncated_true += 1
        print(
            f"level {lvl}: recall={1 - missing / max(total, 1):.4f} "
            f"({missing}/{total} missing), queries with >limit true "
            f"neighbors: {truncated_true}/{len(q)}"
        )
        radius *= 2.0


if __name__ == "__main__":
    main()
