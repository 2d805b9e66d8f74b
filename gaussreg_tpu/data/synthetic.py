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

# bump when the generated distribution changes: tools/trainval.py keys its
# on-disk batch cache on this so stale pyramids are never replayed.
# v3 (VERDICT r3 #4): FPS spacing floor per view (the real loader FPS-
# downsamples to 30k AFTER filtering — dataset.py:122-130 — enforcing a
# minimum spacing that v2's direct sampling lacked; volume-norm-compressed
# ghost blobs could reach z-run densities real clouds cannot), plus a
# "hard" evaluation tier (overlap 0.3-0.65, scale aug up to the reference's
# 1-4x extremes) so held-out recall is no longer saturated at 1.0.
DATA_VERSION = 3


def random_pair(
    cfg: Config,
    seed: int = 0,
    num_points: int | None = None,
    scale_range=(1.0, 2.5),
    overlap: float | None = None,
    normalize_volume: bool = True,
    tier: str = "easy",
):
    """Returns (ref_points, ref_feats, src_points, src_feats, transform).

    `overlap` None draws the shared fraction uniformly from [0.65, 0.9] per
    pair — partial-overlap variety like two real scans of one scene.
    `tier="hard"` is the non-saturated held-out tier: overlap drawn from
    [0.3, 0.65] and the per-cloud scale augmentation always applied with the
    reference's full 1-4x range (dataset.py:181-191).

    `normalize_volume` runs both views through the reference's per-cloud
    scale augmentation + volume normalization (dataset.py:170-212, :132-168
    via gs/extract.adjust_point_cloud_volume), exactly like the real ScanNet
    pipeline. Without it the GT relative scale is unbounded by `scale_range`
    — a distribution the reference network never sees (post-normalization
    real pairs sit near scale 1) and one where level-1 src spacing in the
    ref frame (0.05 * s) starves the 0.05-radius fine-matching supervision
    (measured round 2: f_loss flat at ~2.9, fine IR 0.013, val RR 0)."""
    if tier not in ("easy", "hard"):
        raise ValueError(f"unknown tier {tier!r}")
    rng = np.random.default_rng(seed)
    if overlap is None:
        lo_hi = (0.3, 0.65) if tier == "hard" else (0.65, 0.9)
        overlap = float(rng.uniform(*lo_hi))
    if tier == "hard" and scale_range == (1.0, 2.5):
        scale_range = (1.0, 4.0)
    n = num_points or min(cfg.train.point_limit, cfg.capacity.levels[0])
    # FPS spacing floor (v3): synthesize an oversampled scene and FPS each
    # view down to its target count, mirroring the real loader's
    # fpsample-then-normalize order (reference dataset.py:122-130). This
    # bounds local density everywhere — dense clutter blobs get thinned
    # exactly as real reconstruction artifacts would.
    n_final = n
    n = 2 * n
    # structured indoor-like scene: floor + walls + boxes + spheres, with
    # per-surface colors — gives KPConv distinctive local geometry to learn
    # (pure gaussian blobs are self-similar and unlearnable)
    surfaces = []
    ext = rng.uniform(2.5, 3.5, size=2)
    h = rng.uniform(1.8, 2.6)

    def surf(pts, color):
        c = np.broadcast_to(np.asarray(color, np.float32), (pts.shape[0], 3))
        surfaces.append((pts.astype(np.float32), c))

    def plane(origin, u, v, count, color):
        a = rng.uniform(size=(count, 1))
        b = rng.uniform(size=(count, 1))
        surf(origin + a * u + b * v, color)

    n_floor = int(n * 0.3)
    plane(np.zeros(3), [ext[0], 0, 0], [0, 0, ext[1]], n_floor,
          rng.uniform(50, 200, 3))
    plane(np.zeros(3), [ext[0], 0, 0], [0, h, 0], int(n * 0.15),
          rng.uniform(50, 200, 3))
    plane(np.zeros(3), [0, 0, ext[1]], [0, h, 0], int(n * 0.15),
          rng.uniform(50, 200, 3))
    # furniture: boxes and spheres
    remaining = n - sum(s[0].shape[0] for s in surfaces)
    num_objects = rng.integers(4, 9)
    for i in range(num_objects):
        cnt = remaining // num_objects if i < num_objects - 1 else (
            remaining - (remaining // num_objects) * (num_objects - 1)
        )
        center = np.array(
            [rng.uniform(0.3, ext[0] - 0.3), rng.uniform(0.1, h * 0.5),
             rng.uniform(0.3, ext[1] - 0.3)]
        )
        color = rng.uniform(30, 230, 3)
        if rng.uniform() < 0.5:  # sphere shell
            r = rng.uniform(0.1, 0.4)
            d = rng.normal(size=(cnt, 3))
            d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-9
            surf(center + r * d, color)
        else:  # box surface
            size = rng.uniform(0.15, 0.6, 3)
            face = rng.integers(0, 3, size=cnt)
            sign = rng.choice([-1.0, 1.0], size=cnt)
            p = rng.uniform(-0.5, 0.5, size=(cnt, 3)) * size
            p[np.arange(cnt), face] = 0.5 * sign * size[face]
            surf(center + p, color)

    pts = np.concatenate([s[0] for s in surfaces])[:n]
    colors = np.concatenate([s[1] for s in surfaces])[:n]
    # positional color texture: low-frequency sinusoidal fields attached to
    # the scene (computed BEFORE view splitting, so both scans observe the
    # same texture). Real GS scans carry rich per-point color; with uniform
    # per-surface colors the interior of a flat surface is locally
    # indistinguishable (KPConv features are translation-invariant) and the
    # fine-matching NLL plateaus at its ambiguity floor (~log 18 ~ 2.9,
    # measured round 2) — point-level supervision needs point-level signal
    for _ in range(2):
        k = rng.normal(size=(3, 3)) * rng.uniform(1.0, 4.0)  # cycles/m
        phase = rng.uniform(0, 2 * np.pi, size=3)
        amp = rng.uniform(20.0, 45.0, size=3)
        colors = colors + amp * np.sin(pts @ k.T * (2 * np.pi) + phase)
    colors = np.clip(colors + rng.normal(scale=10, size=colors.shape), 0, 255)
    feats = np.concatenate(
        [rng.uniform(0.7, 1.0, size=(n, 1)).astype(np.float32),
         colors.astype(np.float32)],
        axis=1,
    )

    # ref/src = two partially-overlapping spatial crops of the scene (two
    # scans from different viewpoints), plus independent point subsampling.
    # `overlap` sets the shared fraction: each view keeps points on its side
    # of a random plane shifted so ~overlap of the scene is seen by both.
    centered = pts - pts.mean(0)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis) + 1e-9
    proj = centered @ axis
    lo, hi = np.quantile(proj, [0.02, 0.98])
    margin = (hi - lo) * (1.0 - overlap) * 0.5
    ref_zone = proj <= hi - margin
    src_zone = proj >= lo + margin
    n_keep = int(n * 0.8)

    def pick(zone):
        idx = np.flatnonzero(zone)
        if idx.shape[0] > n_keep:
            idx = idx[rng.permutation(idx.shape[0])[:n_keep]]
        return idx

    ref_sel = pick(ref_zone)
    src_sel = pick(src_zone)
    ref_points = pts[ref_sel].astype(np.float32)
    ref_feats = feats[ref_sel]

    def ghost_cloud():
        """Per-view clutter: a small floating blob seen by only one scan
        (reconstruction artifacts / objects moved between captures)."""
        cnt = int(rng.integers(max(1, n_final // 100), max(2, n_final // 40)))
        center = np.array(
            [rng.uniform(0.2, ext[0] - 0.2),
             rng.uniform(0.1, h * 0.8),
             rng.uniform(0.2, ext[1] - 0.2)]
        )
        p = (center + rng.normal(scale=0.08, size=(cnt, 3))).astype(np.float32)
        f = np.concatenate(
            [rng.uniform(0.7, 1.0, size=(cnt, 1)),
             np.broadcast_to(rng.uniform(30, 230, 3), (cnt, 3)).copy()],
            axis=1,
        ).astype(np.float32)
        return p, f

    ghost_rp, ghost_rf = ghost_cloud()
    ghost_sp, ghost_sf = ghost_cloud()
    ref_points = np.concatenate([ref_points, ghost_rp])
    ref_feats = np.concatenate([ref_feats, ghost_rf])

    # v3 spacing floor: FPS each oversampled view down to its v2-sized
    # target (0.8 * n_final scene points + the ghost count)
    from gaussreg_tpu.ops.subsample import furthest_point_sample_host

    ref_target = int(n_final * 0.8) + ghost_rp.shape[0]
    if ref_points.shape[0] > ref_target:
        keep = furthest_point_sample_host(
            ref_points, ref_target, seed=int(rng.integers(1 << 31))
        )
        ref_points = ref_points[keep]
        ref_feats = ref_feats[keep]

    from scipy.spatial.transform import Rotation

    s = rng.uniform(*scale_range)
    r = Rotation.random(random_state=int(seed)).as_matrix().astype(np.float32)
    t = rng.normal(scale=0.5, size=3).astype(np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = s * r
    m[:3, 3] = t
    inv = np.linalg.inv(m)
    src_scene = np.concatenate([pts[src_sel].astype(np.float32), ghost_sp])
    src_feats = np.concatenate([feats[src_sel], ghost_sf])
    src_target = int(n_final * 0.8) + ghost_sp.shape[0]
    if src_scene.shape[0] > src_target:
        # FPS selection is similarity-invariant, so sampling in the scene
        # frame (pre-transform) picks the same spread the src scan would
        keep = furthest_point_sample_host(
            src_scene, src_target, seed=int(rng.integers(1 << 31))
        )
        src_scene = src_scene[keep]
        src_feats = src_feats[keep]
    src_points = (src_scene @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    # measurement noise
    ref_points += rng.normal(scale=0.0025, size=ref_points.shape).astype(np.float32)
    src_points += rng.normal(scale=0.0025, size=src_points.shape).astype(np.float32)

    if normalize_volume:
        # mirror the reference train pipeline: per-cloud scale augmentation
        # (1-4x or inverse, dataset.py:181-191) followed by volume
        # normalization into [10, 50] m^3 (dataset.py:132-168) — the network
        # sees the same bounded post-normalization scale distribution as on
        # real data, and eval un-normalizes exactly like test.py:181-185
        from gaussreg_tpu.gs.extract import adjust_point_cloud_volume

        rotation = m[:3, :3].copy()
        translation = m[:3, 3].copy()
        aug = rng.uniform() * 3.0 + 1.0
        if tier == "hard" or rng.uniform() > 0.5:
            c = aug if rng.uniform() > 0.5 else 1.0 / aug
            src_points = src_points * c
            rotation = rotation / c
        (
            ref_points,
            src_points,
            rotation,
            translation,
            _ref_scale,
            _src_scale,
            _ref_center,
            _src_center,
        ) = adjust_point_cloud_volume(
            ref_points, src_points, rotation, translation,
            min_adjust_volume=10.0,
        )
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = rotation
        m[:3, 3] = translation
        ref_points = ref_points.astype(np.float32)
        src_points = src_points.astype(np.float32)
    return ref_points, ref_feats, src_points, src_feats, m


def make_synthetic_batch(cfg: Config, seeds: List[int], num_points=None) -> PairBatch:
    """Stack several synthetic pairs into a batched PairBatch (leading axis =
    len(seeds))."""
    batches = []
    for seed in seeds:
        rp, rf, sp, sf, m = random_pair(cfg, seed, num_points=num_points)
        batches.append(make_pair_batch(cfg, rp, rf, sp, sf, m))
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
