#!/usr/bin/env python
"""Backbone (KPConv FPN) stage attribution on real TPU.

Where do the ~450 ms go? Times, via the slope method (see
tools/profile_raster.py): the pyramid build, each KPConv sub-stage in
isolation at level-0 shapes (gather / influence / aggregation einsums), and
full backbone forward / forward+backward.
"""

import sys
import functools

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_raster import timed_slope
from gaussreg_tpu.config import make_cfg
from gaussreg_tpu.data.pipeline import build_pyramid
from gaussreg_tpu.data.synthetic import random_pair
from gaussreg_tpu.models.backbone import KPConvFPN
from gaussreg_tpu.models import kpconv as kp


def main():
    cfg = make_cfg()
    rp, rf, sp, sf, m = random_pair(cfg, 0, num_points=cfg.train.point_limit)
    points = jnp.stack([jnp.asarray(rp), jnp.asarray(sp)])
    mask = jnp.ones(points.shape[:2], bool)
    feats = jnp.concatenate(
        [jnp.asarray(rf)[None], jnp.asarray(sf)[None]], axis=0
    )

    levels = tuple(cfg.capacity.levels)
    limits = tuple(cfg.capacity.neighbor_limits)
    pyr_fn = functools.partial(
        build_pyramid,
        init_voxel_size=cfg.backbone.init_voxel_size,
        init_radius=cfg.backbone.init_radius,
        levels=levels,
        neighbor_limits=limits,
        num_stages=5,
    )

    def pyramid_stage(i):
        pyr = pyr_fn(points + 1e-6 * i, mask)
        return pyr.points[4].sum() + pyr.neighbors[0][:, :, 0].sum()
    timed_slope("pyramid build", pyramid_stage)

    pyr = jax.jit(lambda p: pyr_fn(p, mask))(points)
    pyr = jax.tree.map(jax.device_put, pyr)
    print("level sizes:", [p.shape for p in pyr.points])
    print("neighbor limits:", limits)

    # --- level-0 KPConv sub-stages at encoder1_2 shapes (C=32 mid)
    n0 = pyr.points[0].shape[1]
    h0 = pyr.neighbors[0].shape[2]
    rng = np.random.default_rng(0)
    feats32 = jnp.asarray(rng.normal(size=(2, n0, 32)), jnp.float32)
    nbr0 = pyr.neighbors[0]
    p0 = pyr.points[0]
    kpts = jnp.asarray(kp.generate_kernel_points(15) * cfg.backbone.init_radius)

    def gather_feats(i, f):
        nf = kp.batched_gather(f + 1e-6 * i, nbr0, fill=0.0)
        return nf[:, :, 0, 0].sum() + nf[:, :, -1, -1].sum()
    timed_slope("lvl0 neighbor feats gather (B,M,89,32)", gather_feats,
                big_args=(feats32,))

    def influence(i):
        nbr = kp.batched_gather(p0 + 1e-6 * i, nbr0, fill=kp._SENTINEL_COORD)
        nbr = nbr - p0[:, :, None, :]
        n2 = jnp.sum(nbr * nbr, axis=-1)[..., None]
        cross = jnp.einsum("bmhc,kc->bmhk", nbr, kpts)
        k2 = jnp.sum(kpts * kpts, axis=-1)
        sq = jnp.maximum(n2 - 2.0 * cross + k2, 0.0)
        infl = jnp.maximum(1.0 - jnp.sqrt(sq) / (2.0 * cfg.backbone.init_sigma), 0.0)
        return infl[:, :, 0, :].sum()
    timed_slope("lvl0 influence build (B,M,89,15)", influence)

    infl0 = jax.jit(
        lambda p: jnp.maximum(
            1.0
            - jnp.sqrt(
                jnp.maximum(
                    jnp.sum(
                        (kp.batched_gather(p, nbr0, fill=kp._SENTINEL_COORD)
                         - p[:, :, None, :]) ** 2,
                        axis=-1,
                    )[..., None]
                    - 2.0 * jnp.einsum(
                        "bmhc,kc->bmhk",
                        kp.batched_gather(p, nbr0, fill=kp._SENTINEL_COORD)
                        - p[:, :, None, :],
                        kpts,
                    )
                    + jnp.sum(kpts * kpts, axis=-1),
                    0.0,
                )
            )
            / (2.0 * cfg.backbone.init_sigma),
            0.0,
        )
    )(p0)
    nf0 = jax.jit(lambda f: kp.batched_gather(f, nbr0, fill=0.0))(feats32)
    w0 = jnp.asarray(rng.normal(size=(15, 32, 32)), jnp.float32)

    def einsum1(i, infl, nf):
        bf = jnp.bfloat16
        weighted = jnp.einsum(
            "bmhk,bmhc->bmkc", (infl + 1e-9 * i).astype(bf), nf.astype(bf),
            preferred_element_type=jnp.float32,
        )
        return weighted[:, :, 0, 0].sum()
    timed_slope("lvl0 einsum1 bmhk,bmhc->bmkc", einsum1, big_args=(infl0, nf0))

    wtd0 = jax.jit(
        lambda infl, nf: jnp.einsum(
            "bmhk,bmhc->bmkc", infl.astype(jnp.bfloat16),
            nf.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
        )
    )(infl0, nf0)

    def einsum2(i, wtd):
        bf = jnp.bfloat16
        out = jnp.einsum(
            "bmkc,kcd->bmd", (wtd + 1e-9 * i).astype(bf), w0.astype(bf),
            preferred_element_type=jnp.float32,
        )
        return out[:, :, 0].sum()
    timed_slope("lvl0 einsum2 bmkc,kcd->bmd", einsum2, big_args=(wtd0,))

    # --- full KPConv layer (encoder1_2 mid shapes)
    layer = kp.KPConv(32, 32, 15, cfg.backbone.init_radius,
                      2.0 * cfg.backbone.init_sigma)
    lp = layer.init(jax.random.PRNGKey(0), feats32, p0, p0, nbr0)

    def kpconv_fwd(i, f):
        out = layer.apply(lp, f + 1e-6 * i, p0, p0, nbr0)
        return out[:, :, 0].sum()
    timed_slope("lvl0 KPConv fwd (32->32)", kpconv_fwd, big_args=(feats32,))

    def kpconv_bwd(i, f):
        def loss(ff):
            return layer.apply(lp, ff, p0, p0, nbr0).sum()
        return jax.grad(loss)(f + 1e-6 * i)[:, 0, 0].sum()
    timed_slope("lvl0 KPConv fwd+bwd", kpconv_bwd, big_args=(feats32,))

    # --- full backbone
    bb = KPConvFPN(
        input_dim=cfg.backbone.input_dim,
        output_dim=cfg.backbone.output_dim,
        init_dim=cfg.backbone.init_dim,
        kernel_size=cfg.backbone.kernel_size,
        init_radius=cfg.backbone.init_radius,
        init_sigma=cfg.backbone.init_sigma,
        group_norm=cfg.backbone.group_norm,
    )
    params = jax.jit(lambda k: bb.init(k, feats, pyr))(jax.random.PRNGKey(0))

    def bb_fwd(i, f):
        ff, fc = bb.apply(params, f + 1e-6 * i, pyr)
        return ff[:, :, 0].sum() + fc[:, :, 0].sum()
    timed_slope("backbone fwd", bb_fwd, r_lo=1, r_hi=4, big_args=(feats,))

    def bb_bwd(i, f):
        def loss(p):
            ff, fc = bb.apply(p, f, pyr)
            return ff.sum() + fc.sum()
        g = jax.grad(loss)(params)
        return jax.tree_util.tree_leaves(g)[0].sum() + 1e-6 * i
    timed_slope("backbone fwd+bwd (param grads)", bb_bwd, r_lo=1, r_hi=3,
                big_args=(feats,))


if __name__ == "__main__":
    main()
