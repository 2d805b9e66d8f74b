#!/usr/bin/env python
"""Offline neighbor-limit calibration.

reference: geotransformer/utils/data.py:192-217
(calibrate_neighbors_stack_mode): build per-level neighbor-count histograms
over sample clouds and pick the 80%-quantile caps. The published limits
[89, 30, 43, 49, 49] (reference test.py:129) come from this procedure; this
tool recomputes them for new datasets so CapacityConfig.neighbor_limits can
be updated.

Usage:
    python tools/calibrate_neighbors.py [--data_root ... | --synthetic]
        [--samples 20] [--keep_ratio 0.8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--samples", type=int, default=20)
    parser.add_argument("--keep_ratio", type=float, default=0.8)
    args = parser.parse_args()

    import jax.numpy as jnp

    from gaussreg_tpu.config import make_cfg
    from gaussreg_tpu.data.pipeline import build_pyramid, pad_cloud
    from gaussreg_tpu.data.synthetic import random_pair

    cfg = make_cfg()
    num_stages = cfg.backbone.num_stages
    # generous caps while measuring (reference data.py:196)
    hist_n = int(
        np.ceil(4 / 3 * np.pi * (cfg.backbone.base_radius + 1) ** 3)
    )
    measure_limits = tuple([min(hist_n, 128)] * num_stages)
    hists = np.zeros((num_stages, measure_limits[0] + 1), np.int64)

    def clouds():
        if args.synthetic or args.data_root is None:
            for i in range(args.samples):
                rp, rf, sp, sf, m = random_pair(cfg, i)
                yield rp
                yield sp
        else:
            from gaussreg_tpu.data.scannet import ScanNetGSRegDataset

            ds = ScanNetGSRegDataset(
                args.data_root, "train", point_limit=cfg.train.point_limit
            )
            for i in range(min(args.samples, len(ds))):
                item = ds[i]
                yield item["ref_points"]
                yield item["src_points"]

    for cloud in clouds():
        pts, _, mask = pad_cloud(cloud, cloud[:, :1], cfg.capacity.levels[0])
        pyr = build_pyramid(
            jnp.asarray(pts)[None],
            jnp.asarray(mask)[None],
            cfg.backbone.init_voxel_size,
            cfg.backbone.init_radius,
            cfg.capacity.levels,
            measure_limits,
            num_stages,
        )
        for lvl in range(num_stages):
            nbr = np.asarray(pyr.neighbors[lvl][0])
            msk = np.asarray(pyr.masks[lvl][0])
            counts = (nbr < nbr.shape[0]).sum(axis=1)[msk]
            hists[lvl] += np.bincount(
                counts, minlength=measure_limits[0] + 1
            )[: measure_limits[0] + 1]

    limits = []
    for lvl in range(num_stages):
        cum = np.cumsum(hists[lvl])
        target = args.keep_ratio * cum[-1]
        limits.append(int(np.searchsorted(cum, target) + 1))
    print("calibrated neighbor_limits:", limits)
    print("(update CapacityConfig.neighbor_limits with these)")


if __name__ == "__main__":
    main()
