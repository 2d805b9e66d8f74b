"""Voxel-grid subsampling and furthest point sampling.

TPU-native replacement for the reference's C++ grid-subsampling extension
(reference: geotransformer/extensions/cpu/grid_subsampling/grid_subsampling_cpu.cpp:6-75
and the wrapper geotransformer/modules/ops/grid_subsample.py:7-22): instead of
a voxel hash map on the host, points are packed into integer voxel keys,
sorted, and averaged with a fixed-capacity segment-sum — fully jittable with
static shapes. Output voxel order is sorted-by-key rather than hash-map order;
all downstream consumers are index/mask based so ordering is immaterial
(see SURVEY.md §7.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BITS = 10  # voxel coords clipped to [0, 2^10); 30-bit packed key fits int32
_CMAX = (1 << _BITS) - 1


@functools.partial(jax.jit, static_argnames=("capacity",))
def grid_subsample(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    voxel_size,
    capacity: int,
):
    """Average-pool points into voxels of size `voxel_size`.

    Args:
        points: (N, 3) float array, padded.
        mask: (N,) bool validity mask.
        voxel_size: scalar (static or traced).
        capacity: static output capacity C.

    Returns:
        out_points: (C, 3) voxel centroids (padded slots are 0).
        out_mask: (C,) bool.
        num_voxels: () int32 — true number of occupied voxels (may exceed C;
            overflowed voxels are dropped deterministically from the end of
            the key-sorted order — check `num_voxels > C` to detect loss).
    """
    n = points.shape[0]
    big = jnp.asarray(jnp.finfo(points.dtype).max, points.dtype)
    pmin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    coords = jnp.clip(
        jnp.floor((points - pmin) / voxel_size).astype(jnp.int32), 0, _CMAX
    )
    key = (coords[:, 0] << (2 * _BITS)) | (coords[:, 1] << _BITS) | coords[:, 2]
    # bijective 32-bit scramble (odd multiplier): voxels sort in pseudorandom
    # order, so capacity overflow drops voxels uniformly in space instead of
    # truncating one side of the scene
    key = (key.astype(jnp.uint32) * jnp.uint32(2654435761)).astype(jnp.uint32)
    key = jnp.where(mask, key, jnp.uint32(0xFFFFFFFF))  # invalid sort last

    order = jnp.argsort(key)
    skey = key[order]
    spts = points[order]
    svalid = mask[order]

    first = jnp.concatenate([svalid[:1], (skey[1:] != skey[:-1]) & svalid[1:]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # (N,), -1 only if first pt invalid
    num_voxels = jnp.maximum(seg[-1] + 1, 0)

    seg = jnp.where(svalid & (seg >= 0) & (seg < capacity), seg, capacity)
    sums = jax.ops.segment_sum(
        jnp.where(svalid[:, None], spts, 0.0), seg, num_segments=capacity + 1
    )
    counts = jax.ops.segment_sum(
        svalid.astype(points.dtype), seg, num_segments=capacity + 1
    )
    out_points = sums[:capacity] / jnp.maximum(counts[:capacity, None], 1.0)
    out_mask = counts[:capacity] > 0
    return out_points, out_mask, num_voxels


def morton_code(points: jnp.ndarray, mask: jnp.ndarray, cell_size) -> jnp.ndarray:
    """30-bit Morton (Z-order) code per point; invalid points get the max
    code so they sort last. Spatially local points get nearby codes."""
    big = jnp.asarray(jnp.finfo(points.dtype).max, points.dtype)
    pmin = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    c = jnp.clip(
        jnp.floor((points - pmin) / cell_size).astype(jnp.int32), 0, _CMAX
    )

    def spread(x):  # 10 bits -> every 3rd bit of 30
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = spread(c[:, 0]) | (spread(c[:, 1]) << 1) | (spread(c[:, 2]) << 2)
    return jnp.where(mask, code, jnp.int32(2**30))


def spatial_sort(points: jnp.ndarray, mask: jnp.ndarray, cell_size):
    """Sort points into Morton order (padding last). Returns
    (points, mask, permutation). Spatially ordering each pyramid level makes
    neighbor indices *local*, which is the difference between ~5 GB/s and
    ~280 GB/s for the backbone's neighbor-feature gathers on TPU."""
    code = morton_code(points, mask, cell_size)
    order = jnp.argsort(code)
    return points[order], mask[order], order


def furthest_point_sample_host(points: np.ndarray, num_samples: int, seed: int = 0):
    """Host-side furthest point sampling (numpy), replacement for the
    reference's Rust-backed `fpsample.bucket_fps_kdline_sampling`
    (reference: geotransformer/datasets/registration/ScanNet_GSReg/dataset.py:127).

    Prefers the native C++ implementation in gaussreg_tpu.utils.native when
    built; falls back to a blocked numpy O(K*N) loop.

    Returns int64 indices of the selected points.
    """
    n = points.shape[0]
    if num_samples >= n:
        return np.arange(n)
    try:
        from gaussreg_tpu.utils import native

        if native.available():
            return native.furthest_point_sample(
                np.ascontiguousarray(points, dtype=np.float32), num_samples, seed
            )
    except Exception:
        pass

    pts = points.astype(np.float32)
    selected = np.empty(num_samples, dtype=np.int64)
    rng = np.random.default_rng(seed)
    selected[0] = rng.integers(n)
    d2 = np.sum((pts - pts[selected[0]]) ** 2, axis=1)
    for i in range(1, num_samples):
        idx = int(np.argmax(d2))
        selected[i] = idx
        nd2 = np.sum((pts - pts[idx]) ** 2, axis=1)
        np.minimum(d2, nd2, out=d2)
    return selected
