#!/usr/bin/env python
"""Stage breakdown of the honest per-pair registration cost (bench.py's
bench_registration loop body): pyramid build vs model forward, slope-timed
with salted inputs (same anti-memoization discipline as bench.py)."""

import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gaussreg_tpu.config import make_cfg
from gaussreg_tpu.data.pipeline import (
    PairBatch,
    build_pyramid,
    make_pair_batch,
    pad_cloud,
)
from gaussreg_tpu.data.synthetic import random_pair
from gaussreg_tpu.models.registration import create_model


def slope(fn, big, r_lo=2, r_hi=8, n_meas=3):
    def looped(big, salt, R):
        def body(i, acc):
            return acc + fn(i + salt, *big)
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    f = jax.jit(looped, static_argnames="R")
    float(f(big, 0, R=r_lo))
    float(f(big, 0, R=r_hi))
    salt = itertools.count(1)

    def meas(R):
        ts = []
        for _ in range(n_meas):
            t0 = time.time()
            float(f(big, next(salt), R=R))
            ts.append(time.time() - t0)
        return min(ts)

    return (meas(r_hi) - meas(r_lo)) / (r_hi - r_lo)


def main():
    cfg = make_cfg()
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

    cap0 = cfg.capacity.levels[0]
    rp_, rf_, rm_ = pad_cloud(rp, rf, cap0)
    sp_, sf_, sm_ = pad_cloud(sp, sf, cap0)
    points = jnp.asarray(np.stack([rp_, sp_]))
    feats = jnp.asarray(np.stack([rf_, sf_]))
    masks = jnp.asarray(np.stack([rm_, sm_]))

    def pyr_only(i, points, masks):
        p = points + 1e-6 * jnp.float32(i)
        pyr = build_pyramid(
            p, masks, cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
            cfg.capacity.levels, cfg.capacity.neighbor_limits,
            cfg.backbone.num_stages, window_rows0=cfg.capacity.window_rows0,
        )
        # consume EVERY output: leaving any neighbor/sub/up list unused
        # lets XLA dead-code-eliminate its search (a first version summed
        # one list and read 456 ms for what is really a ~1.1 s build)
        acc = jnp.float32(0)
        for t in pyr.neighbors + pyr.subsampling + pyr.upsampling:
            acc += jnp.sum(t.astype(jnp.float32))
        for p_ in pyr.points:
            acc += jnp.sum(p_)
        return acc + pyr.search_overflow

    dt = slope(pyr_only, (points, masks))
    print(f"pyramid_only: {dt*1e3:.1f} ms/pair")

    # forward only: pyramid is loop-INVARIANT here on purpose (hoisted), so
    # the slope isolates the model forward. Perturb FEATURES so the
    # backbone onward cannot hoist.
    pyr0 = jax.jit(
        lambda p, m: build_pyramid(
            p, m, cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
            cfg.capacity.levels, cfg.capacity.neighbor_limits,
            cfg.backbone.num_stages, window_rows0=cfg.capacity.window_rows0,
        )
    )(points, masks)

    def fwd_only(i, feats, params):
        f = feats + 1e-6 * jnp.float32(i)
        f = jnp.take_along_axis(f, pyr0.perm0[:, :, None], axis=1)
        b = PairBatch(pyr0, f, jnp.eye(4))
        out = model.apply(
            params, b, train=False, with_transform=True,
            rngs={"ransac": jax.random.fold_in(jax.random.PRNGKey(0), i)},
        )
        return jnp.sum(out["estimated_transform"])

    dt = slope(fwd_only, (feats, params))
    print(f"forward_only: {dt*1e3:.1f} ms/pair")


if __name__ == "__main__":
    main()
