#!/usr/bin/env python
"""Timed stage bisect of grid_radius_search at level-1 shapes on TPU.

Each stage is timed with the slope method; stages are cumulative prefixes
of the real computation so the per-stage delta attributes the time.
"""

import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_raster import timed_slope
from gaussreg_tpu.ops.neighbors import _count_below, _slab_gather_1d, _BITS

B, N, CAP, LIMIT = 2, 24576, 48, 30
M = N
CHUNK = 128
RADIUS = 0.125


def stages(i, pts, upto):
    p = pts + 1e-6 * i
    mask = jnp.ones((B, N), bool)
    r2 = RADIUS * RADIUS
    pmin = jnp.min(p, axis=(1,), keepdims=True)

    def cellify(x):
        return jnp.clip(
            jnp.floor((x - pmin) / RADIUS).astype(jnp.int32),
            0,
            (1 << _BITS) - 1,
        )

    s_cells = cellify(p)
    key = (
        (s_cells[..., 0] << (2 * _BITS))
        | (s_cells[..., 1] << _BITS)
        | s_cells[..., 2]
    )
    iota = jnp.arange(N, dtype=jnp.uint32)
    tiebreak = (iota * jnp.uint32(2654435761)).astype(jnp.int32)
    order0 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    skey, _, order = jax.lax.sort(
        (key, jnp.broadcast_to(tiebreak, (B, N)), order0), num_keys=2
    )
    if upto == "sort":
        return skey.sum().astype(jnp.float32) + order.sum().astype(jnp.float32)

    planes = []
    big = jnp.float32(3.4e38)
    for a in range(3):
        pa = jnp.take_along_axis(p[..., a], order, axis=1)
        planes.append(
            jnp.concatenate([pa, jnp.full((B, CAP), big, pa.dtype)], 1)
        )
    skey_pad = jnp.concatenate(
        [skey, jnp.full((B, CHUNK), jnp.int32(0x7FFFFFFF))], axis=1
    )
    nch = (N + CHUNK - 1) // CHUNK
    npad = nch * CHUNK
    chmax = jnp.max(
        jnp.concatenate(
            [skey, jnp.full((B, npad - N), jnp.int32(0x7FFFFFFF))], 1
        ).reshape(B, nch, CHUNK),
        axis=-1,
    )
    if upto == "planes":
        return sum(pl.sum() for pl in planes) + chmax.sum().astype(jnp.float32)

    q_cells = s_cells
    dxy = jnp.stack(
        jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"),
        axis=-1,
    ).reshape(9, 2)
    cx = q_cells[..., 0:1] + dxy[:, 0]
    cy = q_cells[..., 1:2] + dxy[:, 1]
    run_ok = (cx >= 0) & (cx < (1 << _BITS)) & (cy >= 0) & (cy < (1 << _BITS))
    cx = jnp.clip(cx, 0, (1 << _BITS) - 1)
    cy = jnp.clip(cy, 0, (1 << _BITS) - 1)
    z0 = jnp.maximum(q_cells[..., 2:3] - 1, 0)
    z1 = jnp.minimum(q_cells[..., 2:3] + 1, (1 << _BITS) - 1)
    lo_key = (cx << (2 * _BITS)) | (cy << _BITS) | z0
    hi_key = (cx << (2 * _BITS)) | (cy << _BITS) | z1

    starts = _count_below(
        skey_pad, chmax, lo_key.reshape(B, -1), CHUNK, strict=True
    ).reshape(B, M, 9)
    if upto == "count1":
        return starts.sum().astype(jnp.float32)
    ends = _count_below(
        skey_pad, chmax, hi_key.reshape(B, -1), CHUNK, strict=False
    ).reshape(B, M, 9)
    lengths = jnp.where(run_ok, ends - starts, 0)
    if upto == "count2":
        return lengths.sum().astype(jnp.float32)

    offs = jnp.arange(CAP, dtype=jnp.int32)
    cand_valid = offs < jnp.minimum(lengths, CAP)[..., None]
    sflat = starts.reshape(B, M * 9)
    d2 = jnp.zeros((B, M, 9, CAP), jnp.float32)
    for a in range(3):
        ca = _slab_gather_1d(planes[a], sflat, CAP).reshape(B, M, 9, CAP)
        diff = ca - p[:, :, None, None, a]
        d2 = d2 + diff * diff
    if upto == "slab":
        return d2.sum()

    d2 = jnp.where(cand_valid, d2, jnp.float32(1e30)).reshape(B, M, 9 * CAP)
    neg, slot = jax.lax.top_k(-d2, LIMIT)
    if upto == "topk":
        return neg.sum() + slot.sum().astype(jnp.float32)

    run = slot // CAP
    within = slot - run * CAP
    picked = jnp.take_along_axis(starts.reshape(B, M, 9), run, axis=-1) + within
    idx = jnp.take_along_axis(
        order, jnp.minimum(picked, N - 1).reshape(B, -1), axis=1
    ).reshape(B, M, LIMIT)
    return idx.sum().astype(jnp.float32)


def main():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 3, size=(B, N, 3)), jnp.float32)
    which = sys.argv[1:] or ["sort", "planes", "count1", "count2", "slab", "topk", "full"]
    for upto in which:
        timed_slope(
            f"upto:{upto}",
            lambda i, pts, u=upto: stages(i, pts, u),
            big_args=(pts,),
        )


if __name__ == "__main__":
    main()
