"""On-device pyramid precompute for the KPConv FPN.

TPU-native replacement for the reference's CPU collate path
(reference: geotransformer/utils/data.py:13-77 precompute_data_stack_mode,
:139-189 registration_collate_fn_stack_mode): the 5-level grid pyramid and
all neighbor/subsampling/upsampling index sets are computed *inside jit*
with static padded capacities, so the whole training step is one XLA program
with no host round-trips.

Instead of stacking [ref, src] into one variable-length cloud with a lengths
vector, the pair is a leading axis of size 2 with per-level masks — identical
semantics (neighbors never cross clouds), MXU-friendly shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gaussreg_tpu.config import Config
from gaussreg_tpu.ops.subsample import grid_subsample, spatial_sort
from gaussreg_tpu.ops.neighbors import grid_radius_search


class Pyramid(NamedTuple):
    """Multi-level pyramid for a batch of clouds (leading axis B, typically 2
    for a [ref, src] pair). All index arrays use sentinel == level capacity."""

    points: Tuple[jnp.ndarray, ...]  # level l: (B, N_l, 3)
    masks: Tuple[jnp.ndarray, ...]  # (B, N_l)
    neighbors: Tuple[jnp.ndarray, ...]  # (B, N_l, K_l) self-level neighbors
    subsampling: Tuple[jnp.ndarray, ...]  # (B, N_{l+1}, K_l) into level l
    upsampling: Tuple[jnp.ndarray, ...]  # (B, N_l, K_{l+1}) into level l+1
    num_voxels: Tuple[jnp.ndarray, ...]  # (B,) true voxel counts (overflow
    # accounting: compare against capacity; see SURVEY.md §7.3)
    perm0: jnp.ndarray  # (B, N0) permutation applied to the level-0 input
    # (Morton sort) — callers must apply it to per-point features
    search_overflow: jnp.ndarray  # () int32, z-runs truncated by the grid
    # radius search's run_cap across all levels; > 0 means neighbors may
    # have been dropped (raise run_cap) — SURVEY §7.3 'no silent truncation'


@functools.partial(
    jax.jit,
    static_argnames=("levels", "neighbor_limits", "num_stages", "window_rows0"),
)
def build_pyramid(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    init_voxel_size: float,
    init_radius: float,
    levels: Tuple[int, ...],
    neighbor_limits: Tuple[int, ...],
    num_stages: int = 5,
    window_rows0: int = 5,
) -> Pyramid:
    """Build the pyramid for a batch of clouds (B, N0, 3).

    Mirrors reference utils/data.py:13-77: level l>0 is a grid subsample at
    voxel_size * 2^l; self-neighbors at radius init_radius * 2^l capped at
    neighbor_limits[l]; subsampling/upsampling index sets between adjacent
    levels (upsampling searched at 2x radius with the next level's cap).
    """
    assert num_stages == len(levels) == len(neighbor_limits)
    b = points.shape[0]

    # every level is kept in Morton (Z-order) so that neighbor indices are
    # spatially local — TPU gathers of neighbor features run ~50x faster
    # with local indices (see ops/subsample.py: spatial_sort)
    points, mask, perm0 = jax.vmap(
        lambda p, m: spatial_sort(p, m, init_voxel_size)
    )(points, mask)

    pts = [points]
    msks = [mask]
    nvox = [jnp.sum(mask, axis=-1).astype(jnp.int32)]
    voxel = init_voxel_size
    for lvl in range(1, num_stages):
        voxel = voxel * 2.0
        p, m, nv = jax.vmap(
            lambda pp, mm, v=voxel, cap=levels[lvl]: grid_subsample(
                pp, mm, v, capacity=cap
            )
        )(pts[-1], msks[-1])
        p, m, _ = jax.vmap(lambda pp, mm, v=voxel: spatial_sort(pp, mm, v))(p, m)
        pts.append(p)
        msks.append(m)
        nvox.append(nv)

    # all searches use the grid-run pruned path (ops/neighbors.py);
    # `search_overflow` counts candidate-run entries beyond the gathered
    # aligned windows (no silent truncation, SURVEY §7.3). Level 0 uses
    # `window_rows0`-row windows: dense reconstruction clutter packs
    # hundreds of points into one radius-sized cell column (worst measured
    # training-pool run: 441 entries; 3-row windows measured 0.9807
    # src/self recall there — tools/probe_overflow.py, PERF.md). Levels
    # >= 1 are post-voxelization (at most a few points per cell) where
    # 2 rows never truncate.
    neighbors = []
    subsampling = []
    upsampling = []
    overflow = jnp.zeros((), jnp.int32)
    radius = init_radius
    for lvl in range(num_stages):
        nbr, of = grid_radius_search(
            pts[lvl], pts[lvl], msks[lvl], msks[lvl], radius,
            neighbor_limits[lvl],
            window_rows=window_rows0 if lvl == 0 else 2,
        )
        neighbors.append(nbr)
        overflow += of
        if lvl < num_stages - 1:
            # supports are level-lvl points: the dense-cell risk follows
            # the SUPPORT set, so the level-0 subsampling search widens too
            sub, of = grid_radius_search(
                pts[lvl + 1], pts[lvl], msks[lvl + 1], msks[lvl], radius,
                neighbor_limits[lvl],
                window_rows=window_rows0 if lvl == 0 else 2,
            )
            subsampling.append(sub)
            overflow += of
            # upsampling lists are consumed ONLY by nearest_upsample
            # (backbone decoder takes the first = nearest neighbor); a
            # 4-wide list keeps knn-interpolation consumers viable while
            # skipping the reference's full next-level cap (the reference
            # computes the wide list and then uses column 0,
            # kpconv/functional.py:6-22 — wasted work on TPU)
            up, of = grid_radius_search(
                pts[lvl], pts[lvl + 1], msks[lvl], msks[lvl + 1],
                radius * 2.0, min(4, neighbor_limits[lvl + 1]),
            )
            upsampling.append(up)
            overflow += of
        radius = radius * 2.0

    return Pyramid(
        points=tuple(pts),
        masks=tuple(msks),
        neighbors=tuple(neighbors),
        subsampling=tuple(subsampling),
        upsampling=tuple(upsampling),
        num_voxels=tuple(nvox),
        perm0=perm0,
        search_overflow=overflow,
    )


class PairBatch(NamedTuple):
    """One registration pair, fully padded/static.

    pyramid: levels with leading axis 2 — index 0 = ref, 1 = src.
    features: (2, N0, C_in) per-point features ([opacity, R, G, B]).
    transform: (4, 4) GT similarity src -> ref (training/eval only).
    """

    pyramid: Pyramid
    features: jnp.ndarray
    transform: jnp.ndarray


def pad_cloud(points, features, capacity: int):
    """Host-side helper: pad (n, 3)/(n, C) numpy arrays to capacity."""
    import numpy as np

    n = points.shape[0]
    assert n <= capacity, (n, capacity)
    p = np.zeros((capacity, 3), np.float32)
    p[:n] = points
    f = np.zeros((capacity, features.shape[1]), np.float32)
    f[:n] = features
    m = np.zeros(capacity, bool)
    m[:n] = True
    return p, f, m


def augment_pair_pose(pb: PairBatch, rng) -> PairBatch:
    """Host-side rigid pose augmentation of a built PairBatch: independent
    rigid motions (Rr, tr), (Rs, ts) applied to the ref/src clouds at every
    pyramid level. Rigid maps preserve all pairwise distances, so the
    neighbor / subsampling / upsampling index lists stay exactly valid —
    pose diversity is free on top of a cached pyramid. The GT similarity
    becomes Tr @ gt @ Ts^-1 (ref' = Tr ref, src' = Ts src).

    The reference draws fresh augmentation per epoch (dataset.py:170-212);
    this provides the epoch-level pose freshness for batch-cached training
    (tools/trainval.py) without re-paying the pyramid build."""
    import numpy as np
    from scipy.spatial.transform import Rotation

    tr = np.eye(4, dtype=np.float32)
    ts = np.eye(4, dtype=np.float32)
    tr[:3, :3] = Rotation.random(random_state=rng).as_matrix()
    ts[:3, :3] = Rotation.random(random_state=rng).as_matrix()
    tr[:3, 3] = rng.normal(scale=0.5, size=3)
    ts[:3, 3] = rng.normal(scale=0.5, size=3)
    both = np.stack([tr, ts])  # (2, 4, 4) per-cloud motions
    rot = both[:, :3, :3]
    off = both[:, None, :3, 3]
    pts = tuple(
        (np.einsum("bnc,bdc->bnd", np.asarray(p, np.float32), rot) + off).astype(
            np.float32
        )
        for p in pb.pyramid.points
    )
    gt = (tr @ np.asarray(pb.transform) @ np.linalg.inv(ts)).astype(np.float32)
    return pb._replace(pyramid=pb.pyramid._replace(points=pts), transform=gt)


def make_pair_batch(
    cfg: Config,
    ref_points,
    ref_features,
    src_points,
    src_features,
    transform=None,
) -> PairBatch:
    """Build a PairBatch from host numpy clouds (pads, stacks, builds the
    pyramid on device)."""
    import numpy as np

    cap0 = cfg.capacity.levels[0]
    rp, rf, rm = pad_cloud(ref_points, ref_features, cap0)
    sp, sf, sm = pad_cloud(src_points, src_features, cap0)
    points = jnp.asarray(np.stack([rp, sp]))
    feats = jnp.asarray(np.stack([rf, sf]))
    masks = jnp.asarray(np.stack([rm, sm]))
    pyramid = build_pyramid(
        points,
        masks,
        cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius,
        cfg.capacity.levels,
        cfg.capacity.neighbor_limits,
        cfg.backbone.num_stages,
        window_rows0=cfg.capacity.window_rows0,
    )
    # level-0 points were Morton-sorted inside build_pyramid: apply the same
    # permutation to the per-point features
    feats = jnp.take_along_axis(feats, pyramid.perm0[:, :, None], axis=1)
    if transform is None:
        transform = jnp.eye(4)
    return PairBatch(pyramid, feats, jnp.asarray(transform, jnp.float32))
