#!/usr/bin/env python
"""Diagnose the hard-tier failures (VERDICT r4 #3): seeds 20000004 /
20000030 (180-degree flips, the first with search_overflow=1820) and
20000006 (translation failure). Re-runs each at window_rows0 in {2, 3, 4}
to test whether level-0 window truncation (the only nonzero overflow in
either transcript) is causal."""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import numpy as np
import jax

from gaussreg_tpu.config import make_cfg
from gaussreg_tpu.data.pipeline import make_pair_batch
from gaussreg_tpu.data.synthetic import random_pair
from gaussreg_tpu.engine.checkpoint import load_checkpoint
from gaussreg_tpu.engine.trainer import make_eval_step
from gaussreg_tpu.models.registration import create_model

CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "checkpoints", "synthetic_coarse.msgpack")

def main():
    seeds = [int(s) for s in (sys.argv[1:] or [20000004, 20000030, 20000006])]
    base = make_cfg()
    model = create_model(base)
    rp, rf, sp, sf, m = random_pair(base, 0)
    example = make_pair_batch(base, rp, rf, sp, sf, m)
    keys = {k: jax.random.PRNGKey(0) for k in ("params", "sample", "ransac")}
    tpl = model.init(keys, example, train=False, with_transform=False)
    params = load_checkpoint(CKPT, tpl)
    for wr in (2, 3, 4):
        cfg = dataclasses.replace(
            base, capacity=dataclasses.replace(base.capacity, window_rows0=wr)
        )
        eval_step = make_eval_step(model, cfg)
        for seed in seeds:
            rp, rf, sp, sf, m = random_pair(cfg, seed, tier="hard")
            batch = make_pair_batch(cfg, rp, rf, sp, sf, m)
            _, metrics = eval_step(params, batch, jax.random.PRNGKey(seed % 97))
            out = {k: round(float(v), 4) for k, v in metrics.items()}
            print(json.dumps({"seed": seed, "window_rows0": wr, **out}), flush=True)

if __name__ == "__main__":
    main()
