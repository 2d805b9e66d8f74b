#!/usr/bin/env python
"""Measure the Morton index-distance distribution of exact in-radius
neighborhoods at pyramid levels 0-2 (full capacity, structured synthetic
scenes). Decides the static halo for the banded KPConv window."""

import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
from scipy.spatial import cKDTree
import jax
import jax.numpy as jnp

from gaussreg_tpu.config import make_cfg
from gaussreg_tpu.data.synthetic import random_pair
from gaussreg_tpu.ops.subsample import grid_subsample, spatial_sort


def level_stats(pts, radius, name):
    n = pts.shape[0]
    tree = cKDTree(pts)
    pairs = tree.query_pairs(radius, output_type="ndarray")  # (P, 2) i<j
    delta = np.abs(pairs[:, 0] - pairs[:, 1])
    pct = np.percentile(delta, [50, 90, 99, 99.9, 99.99])
    counts = np.bincount(pairs[:, 0], minlength=n) + np.bincount(
        pairs[:, 1], minlength=n
    )
    print(
        f"{name}: n={n} pairs={len(pairs)} nbrs/pt mean={counts.mean():.1f} "
        f"p99={np.percentile(counts, 99):.0f} | "
        f"|di| p50={pct[0]:.0f} p90={pct[1]:.0f} p99={pct[2]:.0f} "
        f"p99.9={pct[3]:.0f} p99.99={pct[4]:.0f} max={delta.max()}"
    )
    for halo in (256, 384, 512, 768, 1024):
        frac = float(np.mean(delta <= halo))
        print(f"   halo {halo}: covers {frac * 100:.3f}% of neighbor pairs")


def main():
    cfg = make_cfg()
    for seed in (0, 3):
        rp, rf, sp, sf, m = random_pair(
            cfg, seed, num_points=cfg.train.point_limit
        )
        pts = rp
        voxel = cfg.backbone.init_voxel_size
        radius = cfg.backbone.init_radius
        cap = cfg.capacity.levels[0]
        p = np.zeros((cap, 3), np.float32)
        p[: pts.shape[0]] = pts
        msk = np.zeros((cap,), bool)
        msk[: pts.shape[0]] = True
        pj, mj = jnp.asarray(p), jnp.asarray(msk)
        for lvl in range(3):
            ps, ms, _ = jax.jit(spatial_sort, static_argnums=())(
                pj, mj, voxel
            )
            valid = np.asarray(ms)
            arr = np.asarray(ps)[valid]
            level_stats(arr, radius, f"seed{seed} lvl{lvl} r={radius:.3f}")
            if lvl < 2:
                voxel *= 2.0
                radius *= 2.0
                pj, mj, _ = jax.jit(
                    grid_subsample, static_argnames=("capacity",)
                )(pj, mj, voxel, capacity=cfg.capacity.levels[lvl + 1])


if __name__ == "__main__":
    main()
