#!/usr/bin/env python
"""grid_radius_search sub-stage attribution on TPU at level-0 shapes.

Stages: cell key + argsort + reorder | searchsorted probes | slab gather |
d2 + top_k. Finds which stage makes the composed search slow (probe_pyramid3
measured 5.4 s for the full pyramid — ~25x worse than predicted)."""

import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_raster import timed_slope
from gaussreg_tpu.config import make_cfg
from gaussreg_tpu.data.synthetic import random_pair

B, M, N, RUN_CAP, LIMIT = 2, 30720, 30720, 96, 89
_BITS = 10


def main():
    cfg = make_cfg()
    rp, rf, sp, sf, m = random_pair(cfg, 0, num_points=24000)
    pts = np.zeros((B, M, 3), np.float32)
    pts[0, : rp.shape[0]] = rp
    pts[1, : sp.shape[0]] = sp
    msk = np.zeros((B, M), bool)
    msk[0, : rp.shape[0]] = True
    msk[1, : sp.shape[0]] = True
    points = jnp.asarray(pts)
    mask = jnp.asarray(msk)
    radius = cfg.backbone.init_radius

    big = jnp.asarray(np.finfo(np.float32).max, jnp.float32)
    pmin = jnp.min(jnp.where(mask[..., None], points, big), axis=1, keepdims=True)

    def cellify(p):
        return jnp.clip(
            jnp.floor((p - pmin) / radius).astype(jnp.int32), 0, (1 << _BITS) - 1
        )

    def stage_sort(i):
        p = points + 1e-6 * i
        c = cellify(p)
        key = (c[..., 0] << 20) | (c[..., 1] << 10) | c[..., 2]
        key = jnp.where(mask, key, jnp.int32(0x7FFFFFFF))
        order = jnp.argsort(key, axis=1)
        skey = jnp.take_along_axis(key, order, axis=1)
        spts = jnp.take_along_axis(p, order[..., None], axis=1)
        return skey.sum().astype(jnp.float32) + spts.sum() + order[:, 0].sum()

    timed_slope("sort stage (key+argsort+reorder)", stage_sort)

    # fixed sorted supports for later stages
    c = cellify(points)
    key = (c[..., 0] << 20) | (c[..., 1] << 10) | c[..., 2]
    key = jnp.where(mask, key, jnp.int32(0x7FFFFFFF))
    order = jnp.argsort(key, axis=1)
    skey = jnp.take_along_axis(key, order, axis=1)
    spts = jnp.take_along_axis(points, order[..., None], axis=1)

    dxy = jnp.stack(
        jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"), axis=-1
    ).reshape(9, 2)

    def probes_of(p):
        qc = cellify(p)
        cx = jnp.clip(qc[..., 0:1] + dxy[:, 0], 0, 1023)
        cy = jnp.clip(qc[..., 1:2] + dxy[:, 1], 0, 1023)
        z0 = jnp.maximum(qc[..., 2:3] - 1, 0)
        z1 = jnp.minimum(qc[..., 2:3] + 1, 1023)
        lo = (cx << 20) | (cy << 10) | z0
        hi = (cx << 20) | (cy << 10) | z1
        return lo, hi

    def stage_searchsorted(i):
        lo, hi = probes_of(points + 1e-6 * i)
        starts = jax.vmap(jnp.searchsorted, in_axes=(0, 0))(
            skey, lo.reshape(B, -1)
        )
        ends = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side="right"))(
            skey, hi.reshape(B, -1)
        )
        return (ends - starts).sum().astype(jnp.float32)

    timed_slope("searchsorted stage (2x 276k probes)", stage_searchsorted)

    lo, hi = probes_of(points)
    starts0 = jax.vmap(jnp.searchsorted, in_axes=(0, 0))(skey, lo.reshape(B, -1)).reshape(B, M, 9)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )
    pad = jnp.full((RUN_CAP, 3), big, jnp.float32)

    def stage_slab(i):
        sp_ = spts + 1e-6 * i
        out = jnp.stack(
            [
                jax.lax.gather(
                    jnp.concatenate([sp_[b], pad], axis=0),
                    starts0[b].reshape(-1, 1),
                    dnums,
                    slice_sizes=(RUN_CAP, 3),
                ).reshape(M, 9, RUN_CAP, 3)
                for b in range(B)
            ]
        )
        return out.sum()

    timed_slope("slab gather (B*M*9 slabs of (96,3))", stage_slab)

    # flat row gather alternative: same candidates as 53M individual rows
    offs = jnp.arange(RUN_CAP, dtype=jnp.int32)
    cand = jnp.minimum(starts0[..., None] + offs, N - 1)  # (B, M, 9, cap)

    def stage_rowgather(i):
        sp_ = (spts + 1e-6 * i).reshape(B * N, 3)
        off = (jnp.arange(B, dtype=jnp.int32) * N).reshape(B, 1, 1, 1)
        out = sp_[(cand + off).reshape(-1)]
        return out.sum()

    timed_slope("flat row gather (53M rows)", stage_rowgather)

    cpts = None  # big intermediate; rebuild inside stage

    def stage_d2_topk(i):
        sp_ = spts + 1e-6 * i
        out = jnp.stack(
            [
                jax.lax.gather(
                    jnp.concatenate([sp_[b], pad], axis=0),
                    starts0[b].reshape(-1, 1),
                    dnums,
                    slice_sizes=(RUN_CAP, 3),
                ).reshape(M, 9, RUN_CAP, 3)
                for b in range(B)
            ]
        )
        d2 = jnp.sum((out - points[:, :, None, None, :]) ** 2, axis=-1)
        neg, slot = jax.lax.top_k(-d2.reshape(B, M, 9 * RUN_CAP), LIMIT)
        return neg.sum() + slot[..., 0].sum().astype(jnp.float32)

    timed_slope("slab gather + d2 + top_k(864->89)", stage_d2_topk)


if __name__ == "__main__":
    main()
