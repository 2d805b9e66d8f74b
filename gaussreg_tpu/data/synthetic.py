"""Synthetic registration pairs (tests, benchmarks, dry runs).

Generates scene pairs with a known GT similarity transform, mimicking the
statistics of the ScanNet-GSReg pipeline output (volume-normalized clouds
with [opacity, RGB] features; reference datasets/.../dataset.py:214-261).
"""

from __future__ import annotations

from typing import List

import jax
import numpy as np

from gaussreg_tpu.config import Config
from gaussreg_tpu.data.pipeline import PairBatch, make_pair_batch


def random_pair(
    cfg: Config,
    seed: int = 0,
    num_points: int | None = None,
    scale_range=(1.0, 2.5),
    overlap: float = 0.8,
):
    """Returns (ref_points, ref_feats, src_points, src_feats, transform)."""
    rng = np.random.default_rng(seed)
    n = num_points or min(cfg.train.point_limit, cfg.capacity.levels[0])
    # clustered points resembling an indoor surface distribution
    num_clusters = 40
    centers = rng.uniform(0, 3.0, size=(num_clusters, 3))
    assign = rng.integers(0, num_clusters, size=n)
    pts = centers[assign] + rng.normal(scale=0.25, size=(n, 3))
    feats = np.concatenate(
        [
            rng.uniform(0.7, 1.0, size=(n, 1)),  # opacity
            rng.uniform(0, 255, size=(n, 3)),  # RGB
        ],
        axis=1,
    ).astype(np.float32)

    # ref = subset of scene; src = (possibly different) subset, transformed
    n_keep = int(n * overlap)
    ref_sel = rng.permutation(n)[:n_keep]
    src_sel = rng.permutation(n)[:n_keep]
    ref_points = pts[ref_sel].astype(np.float32)
    ref_feats = feats[ref_sel]

    from scipy.spatial.transform import Rotation

    s = rng.uniform(*scale_range)
    r = Rotation.random(random_state=int(seed)).as_matrix().astype(np.float32)
    t = rng.normal(scale=0.5, size=3).astype(np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = s * r
    m[:3, 3] = t
    inv = np.linalg.inv(m)
    src_points = (pts[src_sel] @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    src_feats = feats[src_sel]
    # measurement noise
    ref_points += rng.normal(scale=0.0025, size=ref_points.shape).astype(np.float32)
    src_points += rng.normal(scale=0.0025, size=src_points.shape).astype(np.float32)
    return ref_points, ref_feats, src_points, src_feats, m


def make_synthetic_batch(cfg: Config, seeds: List[int], num_points=None) -> PairBatch:
    """Stack several synthetic pairs into a batched PairBatch (leading axis =
    len(seeds))."""
    batches = []
    for seed in seeds:
        rp, rf, sp, sf, m = random_pair(cfg, seed, num_points=num_points)
        batches.append(make_pair_batch(cfg, rp, rf, sp, sf, m))
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
