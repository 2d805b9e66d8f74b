#!/usr/bin/env python
"""Train-step attribution on the real TPU (slope method; see
tools/profile_raster.py).

Where do the ~3.5 s of a full-capacity train step go? Stages timed in
isolation at production shapes (batch of 1 synthetic pair, 30720 pts):

  - model forward (loss scalar only)
  - model forward + backward (grads)
  - full train step wall-clock (forward + backward + Adam, donated state)

Optionally captures a jax.profiler device trace of the fwd+bwd graph
(--trace /tmp/ts_trace) for op-level attribution.

Reuses the training run's on-disk batch cache when present
(output/synthetic_r2/batch_cache/...) so the pyramid build isn't re-paid.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_raster import timed_slope
from gaussreg_tpu.config import make_cfg
from gaussreg_tpu.data.pipeline import make_pair_batch
from gaussreg_tpu.data.synthetic import random_pair
from gaussreg_tpu.engine.trainer import (
    _loss_for_pair,
    create_train_state,
    make_optimizer,
    make_train_step,
)
from gaussreg_tpu.models.registration import create_model


def load_or_build_batch(cfg, seed=0):
    tag = "-".join(
        map(str, tuple(cfg.capacity.levels) + tuple(cfg.capacity.neighbor_limits))
    ) + f"-{cfg.train.point_limit}"
    path = os.path.join("output/synthetic_r2/batch_cache", tag, f"{seed}.npz")
    pb = make_pair_batch(cfg, *random_pair(cfg, seed))
    if os.path.exists(path):
        treedef = jax.tree_util.tree_structure(pb)
        with np.load(path) as f:
            leaves = [f[f"arr_{i}"] for i in range(len(f.files))]
        leaves = [
            a.astype(np.int32) if a.dtype == np.int16 else a for a in leaves
        ]
        pb = jax.tree_util.tree_unflatten(treedef, leaves)
        print(f"loaded cached batch {path}")
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], pb)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="jax.profiler trace dir")
    ap.add_argument("--only", default=None, help="substring stage filter")
    args = ap.parse_args()

    cfg = make_cfg()
    model = create_model(cfg)
    batch = load_or_build_batch(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=256)
    example = jax.tree_util.tree_map(lambda x: x[0], batch)
    state = create_train_state(cfg, model, example, jax.random.PRNGKey(0), tx)
    key = jax.random.PRNGKey(0)

    def fwd(i, params, batch):
        k = jax.random.fold_in(key, i)
        pb = jax.tree_util.tree_map(lambda x: x[0], batch)
        pb = pb._replace(features=pb.features + 1e-6 * i)
        loss, _ = _loss_for_pair(model, cfg, params, pb, k)
        return loss

    if not args.only or args.only in "model fwd (loss)":
        timed_slope(
            "model fwd (loss)", fwd, r_lo=1, r_hi=4,
            big_args=(state.params, batch),
        )

    def fwd_bwd(i, params, batch):
        k = jax.random.fold_in(key, i)
        pb = jax.tree_util.tree_map(lambda x: x[0], batch)
        pb = pb._replace(features=pb.features + 1e-6 * i)

        def loss_fn(p):
            loss, _ = _loss_for_pair(model, cfg, p, pb, k)
            return loss

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        return sum(jnp.sum(jnp.abs(x)) for x in leaves[::7]).astype(jnp.float32)

    if not args.only or args.only in "model fwd+bwd (grads)":
        timed_slope(
            "model fwd+bwd (grads)", fwd_bwd, r_lo=1, r_hi=4,
            big_args=(state.params, batch),
        )

    # full step wall-clock (donated state can't slope-loop; median of timed
    # singles with per-rep input perturbation to defeat relay memoization)
    train_step = make_train_step(model, cfg, tx, mesh=None)
    times = []
    st = state
    for i in range(7):
        b = batch._replace(features=batch.features + 1e-6 * i)
        keys = jax.random.split(jax.random.fold_in(key, i), 1)
        t0 = time.perf_counter()
        st, metrics = train_step(st, b, keys)
        float(metrics["loss"])  # host materialization
        times.append(time.perf_counter() - t0)
    mid = sorted(times[2:])
    print(
        f"full train step (median of {len(mid)}): {mid[len(mid) // 2] * 1e3:.0f} ms"
        f"   all={['%.0f' % (t * 1e3) for t in times]}"
    )

    if args.trace:
        with jax.profiler.trace(args.trace):
            b = batch._replace(features=batch.features + 1e-5)
            keys = jax.random.split(jax.random.fold_in(key, 999), 1)
            st, metrics = train_step(st, b, keys)
            float(metrics["loss"])
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
