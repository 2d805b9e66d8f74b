#!/usr/bin/env python
"""Eval-forward attribution for the registration model (VERDICT r3 #2).

Two views:
  1. slope-method stage times (with_transform False vs True) — where the
     pairs/s metric's time actually goes;
  2. a jax.profiler device trace of one eval forward, aggregated op-by-op
     (Chrome trace JSON; works through the axon tunnel, PERF.md).

Usage: python tools/profile_eval.py [--trace] [--stages]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import tools.profile_raster as _pr

_pr.STAGE_FILTER = []  # it grabs sys.argv at import; our flags aren't stages
timed_slope = _pr.timed_slope
from gaussreg_tpu.config import make_cfg
from gaussreg_tpu.data.pipeline import make_pair_batch
from gaussreg_tpu.data.synthetic import random_pair
from gaussreg_tpu.models.registration import create_model


def build(cfg):
    model = create_model(cfg)
    rp, rf, sp, sf, m = random_pair(cfg, 0, num_points=cfg.train.point_limit)
    batch = make_pair_batch(cfg, rp, rf, sp, sf, m)
    init = jax.jit(
        lambda k, b: model.init(
            {"params": k, "sample": k, "ransac": k}, b, train=False,
            with_transform=False,
        )
    )
    params = init(jax.random.PRNGKey(0), batch)
    return model, batch, params


def stages(model, batch, params):
    key = jax.random.PRNGKey(0)

    def fwd_no_t(i, batch, params):
        b = batch._replace(features=batch.features + 1e-6 * i)
        out = model.apply(params, b, train=False, with_transform=False)
        return jnp.sum(out["ref_feats_c"])

    timed_slope("eval fwd, no transform (backbone+tfm+OT)", fwd_no_t,
                r_lo=2, r_hi=6, big_args=(batch, params))

    def fwd_full(i, batch, params):
        b = batch._replace(features=batch.features + 1e-6 * i)
        out = model.apply(
            params, b, train=False, with_transform=True,
            rngs={"ransac": jax.random.fold_in(key, i)},
        )
        return jnp.sum(out["estimated_transform"])

    timed_slope("eval fwd, full (+LGR+RANSAC)", fwd_full,
                r_lo=2, r_hi=6, big_args=(batch, params))


def trace(model, batch, params):
    key = jax.random.PRNGKey(7)

    @jax.jit
    def fwd(batch, params, key):
        out = model.apply(
            params, batch, train=False, with_transform=True,
            rngs={"ransac": key},
        )
        return jnp.sum(out["estimated_transform"])

    float(fwd(batch, params, key))  # compile
    tdir = "/tmp/jtrace_eval"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        float(fwd(batch, params, jax.random.fold_in(key, 1)))
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    print(f"trace files: {files}")
    agg = collections.Counter()
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            # device lanes only: XLA ops carry args.long_name or run on
            # TPU pids; heuristic: skip python/host threads by name
            name = ev.get("name", "")
            dur = ev.get("dur", 0) / 1e3  # ms
            cat = (ev.get("args") or {}).get("device_type", "")
            pidname = ev.get("pid")
            if cat != "TPU" and "fusion" not in name and "copy" not in name \
               and not any(k in name for k in (
                   "sort", "gather", "scatter", "convolution", "dot",
                   "reduce", "while", "dynamic", "slice", "transpose",
                   "iota", "broadcast", "select", "concatenate", "custom",
                   "all-reduce", "add", "multiply", "exp", "cumsum", "rem",
               )):
                continue
            # collapse xla op unique suffixes: name.123 -> name
            base = name.split(".")[0]
            agg[base] += dur
            total += dur
    print(f"\n== device op aggregate (total {total:.1f} ms) ==")
    for name, dur in agg.most_common(40):
        print(f"{dur:9.3f} ms  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--stages", action="store_true")
    args = ap.parse_args()
    cfg = make_cfg()
    model, batch, params = build(cfg)
    if args.stages or not args.trace:
        stages(model, batch, params)
    if args.trace:
        trace(model, batch, params)


if __name__ == "__main__":
    main()
