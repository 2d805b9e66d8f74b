#!/usr/bin/env python
"""build_pyramid sub-stage attribution on TPU: the composed searches vs the
subsample/sort chain (probe_pyramid.py showed a lone d2+top_k block costs
only ~5 ms, yet the full pyramid costs ~1.3 s — find the gap)."""

import sys
import functools

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_raster import timed_slope
from gaussreg_tpu.config import make_cfg
from gaussreg_tpu.data.synthetic import random_pair
from gaussreg_tpu.ops.subsample import grid_subsample, spatial_sort
from gaussreg_tpu.ops.neighbors import radius_search


def main():
    cfg = make_cfg()
    rp, rf, sp, sf, m = random_pair(cfg, 0, num_points=cfg.train.point_limit)
    cap0 = cfg.capacity.levels[0]
    pts0 = np.zeros((2, cap0, 3), np.float32)
    pts0[0, : rp.shape[0]] = rp
    pts0[1, : sp.shape[0]] = sp
    msk0 = np.zeros((2, cap0), bool)
    msk0[0, : rp.shape[0]] = True
    msk0[1, : sp.shape[0]] = True
    points = jnp.asarray(pts0)
    mask = jnp.asarray(msk0)
    v0 = cfg.backbone.init_voxel_size
    r0 = cfg.backbone.init_radius
    caps = cfg.capacity.levels
    lims = cfg.capacity.neighbor_limits

    def sort_stage(i):
        p, m_, perm = jax.vmap(lambda p_, m2: spatial_sort(p_, m2, v0))(
            points + 1e-6 * i, mask
        )
        return p[:, 0].sum() + perm[:, -1].sum()
    timed_slope("spatial_sort lvl0 (2x30720)", sort_stage)

    def subsample_chain(i):
        p, m_ = points + 1e-6 * i, mask
        tot = jnp.float32(0.0)
        voxel = v0
        for lvl in range(1, 5):
            voxel *= 2.0
            p, m_, nv = jax.vmap(
                lambda pp, mm, v=voxel, cap=caps[lvl]: grid_subsample(
                    pp, mm, v, capacity=cap
                )
            )(p, m_)
            p, m_, _ = jax.vmap(lambda pp, mm, v=voxel: spatial_sort(pp, mm, v))(p, m_)
            tot += p[:, 0].sum() + nv.sum()
        return tot
    timed_slope("subsample+sort chain lvl1-4", subsample_chain)

    # single vmapped self-search at level 0 (as the pyramid does it)
    def search0(i):
        idx = jax.vmap(
            lambda q, s, qm, sm: radius_search(q, s, qm, sm, r0, lims[0])
        )(points + 1e-6 * i, points, mask, mask)
        return (idx[:, :, 0] + idx[:, :, -1]).sum().astype(jnp.float32)
    timed_slope("vmapped radius_search lvl0 (89)", search0)

    # same without vmap (loop the two clouds)
    def search0_novmap(i):
        tot = jnp.float32(0.0)
        for b in range(2):
            idx = radius_search(
                points[b] + 1e-6 * i, points[b], mask[b], mask[b], r0, lims[0]
            )
            tot += (idx[:, 0] + idx[:, -1]).sum().astype(jnp.float32)
        return tot
    timed_slope("looped radius_search lvl0 (89)", search0_novmap)

    # traced radius (the pyramid passes a traced float) vs static
    def search0_static(i):
        def rs(q, s, qm, sm):
            d2_block = functools.partial(radius_search, radius=r0, limit=lims[0])
            return d2_block(q, s, qm, sm)
        idx = jax.vmap(rs)(points + 1e-6 * i, points, mask, mask)
        return (idx[:, :, 0] + idx[:, :, -1]).sum().astype(jnp.float32)
    timed_slope("vmapped static-radius lvl0", search0_static)


if __name__ == "__main__":
    main()
