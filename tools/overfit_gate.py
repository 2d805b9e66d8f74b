#!/usr/bin/env python
"""Gated overfit experiment (VERDICT r2 next-round #1): train on a tiny fixed
set of pairs and evaluate ON THOSE SAME PAIRS, reporting the full stage chain
(PIR -> fine IR -> RRE/RMSE/RR). The flagship claim "the network registers"
must first hold in the overfit limit; if fine IR stays ~0 here, the fine
matching path has a bug, not a data problem.

Usage: python tools/overfit_gate.py --pairs 1 --steps 400 [--lr 3e-4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=1)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--eval_every", type=int, default=100)
    ap.add_argument("--log_every", type=int, default=25)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed_base", type=int, default=0)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--dump_dir", default=None,
        help="save final params (msgpack) + est/gt transforms (npz) here",
    )
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
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
    model = create_model(cfg)

    print(f"building {args.pairs} pair batches...", flush=True)
    batches = []
    for i in range(args.pairs):
        pb = make_pair_batch(
            cfg, *random_pair(cfg, args.seed_base + i)
        )
        batches.append(jax.tree_util.tree_map(lambda x: np.asarray(x)[None], pb))

    tx = optax.adam(args.lr)
    state = create_train_state(
        cfg, model, jax.tree_util.tree_map(lambda x: x[0], batches[0]),
        jax.random.PRNGKey(0), tx,
    )
    train_step = make_train_step(model, cfg, tx)
    eval_step = make_eval_step(model, cfg)

    def evaluate(params, tag, dump=False):
        ms = []
        for i, vb in enumerate(batches):
            one = jax.tree_util.tree_map(lambda x: x[0], vb)
            est, metrics = eval_step(params, one, jax.random.PRNGKey(100 + i))
            ms.append({k: float(v) for k, v in metrics.items()})
            if dump and args.dump_dir:
                os.makedirs(args.dump_dir, exist_ok=True)
                np.savez(
                    os.path.join(args.dump_dir, f"transforms_{i}.npz"),
                    est=np.asarray(est),
                    gt=np.asarray(one.transform),
                )
        agg = {k: float(np.mean([m[k] for m in ms])) for k in ms[0]}
        print(
            f"[{tag}] PIR {agg['PIR']:.3f} IR {agg['IR']:.3f} | "
            f"RRE {agg['RRE']:.2f}deg RTEabs {agg['RTE_abs']:.3f} "
            f"RSE {agg['RSE']:.3f} RMSE {agg['RMSE']:.3f} RR {agg['RR']:.2f}",
            flush=True,
        )
        return agg

    evaluate(state.params, "step 0")
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for step in range(1, args.steps + 1):
        b = batches[(step - 1) % len(batches)]
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, b, jax.random.split(sub, 1))
        if step % args.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(
                f"step {step}: loss {m['loss']:.4f} c {m['c_loss']:.4f} "
                f"f {m['f_loss']:.4f} PIR {m['PIR']:.3f} "
                f"({(time.time() - t0) / step:.2f}s/step)",
                flush=True,
            )
        if step % args.eval_every == 0:
            evaluate(state.params, f"step {step}")

    final = evaluate(state.params, "final", dump=True)
    if args.dump_dir:
        from gaussreg_tpu.engine.checkpoint import save_checkpoint

        save_checkpoint(args.dump_dir, "overfit", state.params)
    ok = final["RR"] == 1.0 and final["RRE"] < 5.0
    print(f"GATE {'PASS' if ok else 'FAIL'}: RR={final['RR']} RRE={final['RRE']:.2f}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
