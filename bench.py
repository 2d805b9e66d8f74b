#!/usr/bin/env python
"""Driver benchmark. Prints ONE JSON line:
{"metric", "value", "unit", "vs_baseline", "extra"}.

Primary metric (BASELINE.json): GS rasterizer Mrays/s/chip for a full
differentiable render (forward + analytic backward through the Pallas tile
kernels) at 640x480 with a 100k-gaussian scene. `vs_baseline` is
value / 100.0 — CUDA-class 3DGS rasterizers achieve O(100) Mrays/s fwd+bwd
at this scale (the reference repo publishes no numbers: BASELINE.md).

`extra.registration_pairs_per_s` is the second north-star metric: coarse
registrations/s at full 30720-point capacity.

Timing: R reps run inside one jitted fori_loop with per-iteration input
perturbation; a scalar is host-materialized and per-rep time is the slope
between two rep counts. This cancels the ~30 ms/call RTT of the remote-TPU
transport (and its response memoization) without hiding any device work —
see PERF.md.
"""

import json
import time


def _slope(fn, big, r_lo, r_hi, n_meas=3):
    """Per-rep seconds of fn via the slope method (PERF.md).

    Every timed call carries a fresh `salt` operand folded into fn's rep
    index, so no two transport requests are identical — the axon relay
    memoizes repeated identical executions, which silently turns repeat
    calls into ~RTT no-ops and corrupts the slope (the round-3 "22.3
    pairs/s" artifact, PERF.md round 4)."""
    import itertools

    import jax
    import jax.numpy as jnp

    def looped(big, salt, R):
        def body(i, acc):
            return acc + fn(i + salt, *big)
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    # R stays a STATIC loop bound (two executables): a traced trip count
    # pessimizes the compiled loop body — measured 22.6 vs 32.0 Mrays/s
    # and 0.55 vs ~5 pairs/s for identical bodies (PERF.md round 4)
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


def bench_rasterizer():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussreg_tpu.gs.rasterizer.camera import look_at_camera
    from gaussreg_tpu.gs.rasterizer.render import render

    n = 100000
    width, height = 640, 480
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-1, 1, size=(n, 3)), jnp.float32)
    scales = jnp.asarray(
        np.exp(rng.normal(loc=-3.2, scale=0.4, size=(n, 3))), jnp.float32
    )
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opac = jnp.asarray(1 / (1 + np.exp(-rng.normal(1.0, 1.0, size=n))), jnp.float32)
    sh = np.zeros((n, 3, 16), np.float32)
    sh[:, :, 0] = rng.uniform(-1, 1, size=(n, 3))
    sh[:, :, 1:] = rng.normal(scale=0.05, size=(n, 3, 15))
    sh = jnp.asarray(sh)
    cam = look_at_camera(
        eye=[0, 0, -4.0], target=[0, 0, 0], up=[0, 1, 0],
        fov_deg=60, width=width, height=height,
    )
    use_pallas = jax.default_backend() == "tpu"

    # probe-sized steady state (the fine-registration inner loop): probe 1
    # reports the per-tile saturation depths + backward block demand;
    # probe 2 re-bins under those depths to size the live-gaussian and
    # pair capacities. The timed renders then cull pairs behind saturation
    # BEFORE the pair sort (binning.py) and run the backward over tight
    # saturation-compacted buffers (kernels.py). Every timed rep still
    # executes the full pipeline (projection -> cull -> bin -> Pallas
    # fwd+bwd -> accumulation) and re-emits sat_depth, exactly like one
    # step of render-and-compare refinement.
    bwd_cap = None
    sat_depth = None
    live_cap = None
    pair_cap = None
    if use_pallas:
        probe = render(
            means, scales, quats, opac, sh, cam, use_pallas=True,
            max_tiles_per_gaussian=16,
        )
        bwd_cap = int(int(probe.sat_blocks) * 1.10) + 32
        sat_depth = probe.sat_depth
        p2 = render(
            means, scales, quats, opac, sh, cam, use_pallas=True,
            max_tiles_per_gaussian=16, sat_depth=sat_depth,
        )
        live_cap = -(-int(int(p2.num_live) * 1.08) // 256) * 256
        pair_cap = (int(int(p2.num_pairs) * 1.10) + 127) // 128 + 8

    def loss(m, s, q, o, c, sd):
        out = render(
            m, s, q, o, c, cam, use_pallas=use_pallas,
            max_tiles_per_gaussian=16, bwd_capacity_blocks=bwd_cap,
            sat_depth=sd, live_gaussian_cap=live_cap,
            pair_capacity_blocks=pair_cap,
        )
        return out.rgb.sum() + out.transmittance.sum()

    def one(i, m, s, q, o, c, sd):
        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            m + 1e-6 * i, s, q, o, c, sd
        )
        return sum(jnp.sum(x) for x in g)

    dt = _slope(one, (means, scales, quats, opac, sh, sat_depth), r_lo=2, r_hi=8)
    return width * height / dt / 1e6


def bench_registration():
    """Full per-pair device cost: on-device pyramid (neighbor lists) +
    backbone + transformer + matching + LGR + RANSAC. The POINTS are
    perturbed per loop iteration — perturbing only features (or only the
    RANSAC rng, as rounds 1-3 did) lets XLA hoist every point-dependent
    stage out of the fori_loop as loop-invariant, so the slope measured
    only the rng-dependent suffix (the round-3 '9.6 pairs/s' was the
    RANSAC-SVD suffix alone; PERF.md round 4)."""
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

    def one(i, points, feats, masks, params):
        p = points + 1e-6 * jnp.float32(i)
        pyr = build_pyramid(
            p, masks, cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
            cfg.capacity.levels, cfg.capacity.neighbor_limits,
            cfg.backbone.num_stages, window_rows0=cfg.capacity.window_rows0,
        )
        f = jnp.take_along_axis(feats, pyr.perm0[:, :, None], axis=1)
        b = PairBatch(pyr, f, jnp.eye(4))
        out = model.apply(
            params, b, train=False, with_transform=True,
            rngs={"ransac": jax.random.fold_in(jax.random.PRNGKey(0), i)},
        )
        return jnp.sum(out["estimated_transform"])

    dt = _slope(one, (points, feats, masks, params), r_lo=2, r_hi=8, n_meas=3)
    return 1.0 / dt


def main():
    mrays = bench_rasterizer()
    try:
        pairs_s = bench_registration()
    except Exception as e:  # registration bench must never sink the primary
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)
        pairs_s = None
    print(
        json.dumps(
            {
                "metric": "gs_rasterizer_fwd_bwd",
                "value": round(mrays, 2),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / 100.0, 4),
                "extra": {
                    "registration_pairs_per_s": (
                        round(pairs_s, 3) if pairs_s else None
                    ),
                    "registration_capacity_points": 30720,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
