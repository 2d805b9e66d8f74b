#!/usr/bin/env python
"""Per-level grid_radius_search timing on TPU (slope method) to find where
the 22 s pyramid goes."""

import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_raster import timed_slope
from gaussreg_tpu.config import make_cfg
from gaussreg_tpu.data.synthetic import random_pair
from gaussreg_tpu.ops.subsample import grid_subsample, spatial_sort
from gaussreg_tpu.ops.neighbors import grid_radius_search


def main():
    cfg = make_cfg()
    rp, rf, sp, sf, m = random_pair(cfg, 0, num_points=cfg.train.point_limit)
    caps = cfg.capacity.levels
    pts0 = np.zeros((2, caps[0], 3), np.float32)
    pts0[0, : rp.shape[0]] = rp
    pts0[1, : sp.shape[0]] = sp
    msk0 = np.zeros((2, caps[0]), bool)
    msk0[0, : rp.shape[0]] = True
    msk0[1, : sp.shape[0]] = True

    # build the level clouds once (host side via jit calls)
    voxel = cfg.backbone.init_voxel_size
    p0, m0, _ = jax.vmap(
        lambda p, m: spatial_sort(p, m, voxel)
    )(jnp.asarray(pts0), jnp.asarray(msk0))
    pts = [p0]
    msks = [m0]
    for lvl in range(1, cfg.backbone.num_stages):
        voxel *= 2.0
        p, mm, nv = jax.vmap(
            lambda pp, mmm, v=voxel, cap=caps[lvl]: grid_subsample(
                pp, mmm, v, capacity=cap
            )
        )(pts[-1], msks[-1])
        p, mm, _ = jax.vmap(lambda pp, mmm, v=voxel: spatial_sort(pp, mmm, v))(p, mm)
        pts.append(p)
        msks.append(mm)
    for i, (p, mm) in enumerate(zip(pts, msks)):
        print(f"level {i}: cap {p.shape[1]} valid {int(mm.sum())}")

    radius = cfg.backbone.init_radius
    limits = cfg.capacity.neighbor_limits
    for lvl in range(cfg.backbone.num_stages):
        
        p, mm = pts[lvl], msks[lvl]

        def self_search(i, p=p, mm=mm, radius=radius, lim=limits[lvl]):
            idx, of = grid_radius_search(
                p + 1e-6 * i, p + 1e-6 * i, mm, mm, radius, lim, 
            )
            return idx.sum().astype(jnp.float32) + of.astype(jnp.float32)

        timed_slope(f"self lvl{lvl} N={p.shape[1]} lim={limits[lvl]}",
                    self_search)
        idx, of = grid_radius_search(p, p, mm, mm, radius, limits[lvl], )
        print(f"   overflow lvl{lvl}: {int(of)}")
        radius *= 2.0


if __name__ == "__main__":
    main()
