#!/usr/bin/env python
"""Diagnose train-pool vs held-out registration quality for a checkpoint.

Runs the full eval step (LGR + RANSAC transform) on (a) scenes from the
training pool (the same epoch-keyed seed pool tools/trainval.py uses) and
(b) unseen seeds, printing per-pair RRE/RMSE/RR. Discriminates "the network
memorizes the pool" from "the eval path is broken" when val RR is 0.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", required=True)
    parser.add_argument("--pairs", type=int, default=4)
    parser.add_argument("--pool_size", type=int, default=256)
    args = parser.parse_args()

    import jax

    from gaussreg_tpu.config import make_cfg
    from gaussreg_tpu.data.pipeline import make_pair_batch
    from gaussreg_tpu.data.synthetic import random_pair
    from gaussreg_tpu.engine.checkpoint import load_checkpoint
    from gaussreg_tpu.engine.trainer import make_eval_step
    from gaussreg_tpu.models.registration import create_model

    cfg = make_cfg()
    model = create_model(cfg)
    rp, rf, sp, sf, m = random_pair(cfg, 0)
    example = make_pair_batch(cfg, rp, rf, sp, sf, m)
    tpl = jax.eval_shape(
        lambda k, b: model.init(
            {"params": k, "sample": k, "ransac": k},
            b, train=False, with_transform=False,
        ),
        jax.random.PRNGKey(0), example,
    )
    params = load_checkpoint(args.weights, tpl)
    eval_step = make_eval_step(model, cfg)

    pool = np.random.default_rng(cfg.seed).integers(0, 2**31, size=args.pool_size)
    groups = {
        "train-pool": [int(s) for s in pool[: args.pairs]],
        "held-out": [20_000_000 + i for i in range(args.pairs)],
    }
    for name, seeds in groups.items():
        for seed in seeds:
            rp, rf, sp, sf, m = random_pair(cfg, seed)
            batch = make_pair_batch(cfg, rp, rf, sp, sf, m)
            est, metrics = eval_step(params, batch, jax.random.PRNGKey(seed % 997))
            metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
            print(
                f"{name} seed={seed}: PIR={metrics.get('PIR', float('nan')):.3f} "
                f"RRE={metrics['RRE']:.2f} "
                f"RSE={metrics['RSE']:.3f} RMSE={metrics['RMSE']:.3f} "
                f"RR={metrics['RR']:.0f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
