#!/usr/bin/env python
"""build_pyramid end-to-end timing with the grid-run pruned search, plus
full forward, on TPU. Honest: slope method, all outputs consumed."""

import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_raster import timed_slope
from gaussreg_tpu.config import make_cfg
from gaussreg_tpu.data.synthetic import random_pair
from gaussreg_tpu.data.pipeline import build_pyramid, make_pair_batch


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

    def pyramid(i):
        pyr = build_pyramid(
            points + 1e-6 * i,
            mask,
            cfg.backbone.init_voxel_size,
            cfg.backbone.init_radius,
            cfg.capacity.levels,
            cfg.capacity.neighbor_limits,
            cfg.backbone.num_stages,
        )
        tot = pyr.search_overflow.astype(jnp.float32)
        for t in pyr.neighbors + pyr.subsampling + pyr.upsampling:
            tot += (t[:, :, 0] + t[:, :, -1]).sum().astype(jnp.float32)
        for p in pyr.points:
            tot += p[:, 0].sum()
        return tot
    timed_slope("build_pyramid (grid search, full caps)", pyramid)

    # overflow check at production shapes
    pyr = build_pyramid(
        points, mask,
        cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
        cfg.capacity.levels, cfg.capacity.neighbor_limits,
        cfg.backbone.num_stages,
    )
    print("search_overflow:", int(pyr.search_overflow))

    # full forward with the new pipeline
    from gaussreg_tpu.models.registration import create_model
    model = create_model(cfg)
    batch = make_pair_batch(cfg, rp, rf, sp, sf, m)
    init = jax.jit(
        lambda k, b: model.init(
            {"params": k, "sample": k, "ransac": k}, b, train=False,
            with_transform=False,
        )
    )
    params = init(jax.random.PRNGKey(0), batch)

    fwd = jax.jit(
        lambda p, b: model.apply(
            p, b, train=False, with_transform=False,
            rngs={"ransac": jax.random.PRNGKey(1)},
        )
    )

    feats = batch.features

    def fwd_fn(i):
        b = batch._replace(features=feats + 1e-6 * i)
        out = fwd(params, b)
        return out["ref_feats_c"].sum() + out["src_node_corr_knn_points"].sum()
    timed_slope("full forward (no transform)", fwd_fn)


if __name__ == "__main__":
    main()
