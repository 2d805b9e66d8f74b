#!/usr/bin/env python
"""Training smoke test: overfit the coarse model on a small synthetic set
and report registration metrics before/after — validates that gradients,
losses, GT supervision, and the eval pipeline fit together end to end.

Usage: python tools/smoke_train.py [--steps 200] [--pairs 16] [--tiny]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--pairs", type=int, default=16)
    parser.add_argument("--val_pairs", type=int, default=4)
    parser.add_argument("--tiny", action="store_true")
    parser.add_argument("--lr", type=float, default=3e-4)
    args = parser.parse_args()

    import dataclasses

    import jax
    import optax

    from gaussreg_tpu.config import make_cfg, make_tiny_cfg
    from gaussreg_tpu.data.pipeline import make_pair_batch
    from gaussreg_tpu.data.synthetic import random_pair
    from gaussreg_tpu.engine.trainer import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )
    from gaussreg_tpu.models.registration import create_model

    cfg = make_tiny_cfg() if args.tiny else make_cfg()
    cfg = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, lr=args.lr)
    )
    model = create_model(cfg)

    print("building batches...", flush=True)
    num_points = 800 if args.tiny else 20000
    batches = []
    for i in range(args.pairs):
        rp, rf, sp, sf, m = random_pair(cfg, i, num_points=num_points)
        batches.append(make_pair_batch(cfg, rp, rf, sp, sf, m))
    val_batches = []
    for i in range(args.val_pairs):
        rp, rf, sp, sf, m = random_pair(cfg, 10_000 + i, num_points=num_points)
        val_batches.append(make_pair_batch(cfg, rp, rf, sp, sf, m))

    tx = optax.adam(args.lr)
    state = create_train_state(cfg, model, batches[0], jax.random.PRNGKey(0), tx)
    train_step = make_train_step(model, cfg, tx)
    eval_step = make_eval_step(model, cfg)

    def evaluate(params, tag):
        ms = []
        for i, vb in enumerate(val_batches):
            _, metrics = eval_step(params, vb, jax.random.PRNGKey(100 + i))
            ms.append({k: float(v) for k, v in metrics.items()})
        agg = {k: float(np.mean([m[k] for m in ms])) for k in ms[0]}
        print(
            f"[{tag}] RRE {agg['RRE']:.2f} deg, RTE {agg['RTE']:.3f}, "
            f"RSE {agg['RSE']:.3f}, RMSE {agg['RMSE']:.3f}, RR {agg['RR']:.2f}",
            flush=True,
        )
        return agg

    before = evaluate(state.params, "before")
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for step in range(args.steps):
        b = batches[step % len(batches)]
        bb = jax.tree_util.tree_map(lambda x: x[None], b)
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, bb, sub[None])
        if step == 0:
            first_pir = float(metrics["PIR"])
        last_pir = float(metrics["PIR"])
        if (step + 1) % 20 == 0:
            print(
                f"step {step + 1}: loss {float(metrics['loss']):.4f} "
                f"(c {float(metrics['c_loss']):.4f} f {float(metrics['f_loss']):.4f}) "
                f"PIR {float(metrics['PIR']):.3f} "
                f"[{(time.time() - t0) / (step + 1):.2f}s/step]",
                flush=True,
            )
    after = evaluate(state.params, "after")

    print(f"coarse matching precision: {first_pir:.3f} -> {last_pir:.3f}", flush=True)
    improved = (
        after["RRE"] < before["RRE"] and after["RMSE"] < before["RMSE"]
    ) or last_pir > first_pir + 0.05
    print("IMPROVED" if improved else "NOT IMPROVED", flush=True)
    return 0 if improved else 1


if __name__ == "__main__":
    sys.exit(main())
