"""High-level user API: register and fuse Gaussian Splatting models.

Mirrors the reference CLI flows (experiments/.../demo.py:21-183, test.py and
gs_fusion.py) as library calls.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np

from gaussreg_tpu.config import Config, make_cfg
from gaussreg_tpu.data.pipeline import make_pair_batch
from gaussreg_tpu.gs.extract import (
    adjust_point_cloud_volume,
    load_point_cloud_from_gs_ply,
)
from gaussreg_tpu.gs.cameras import find_cameras_json, load_cameras_json
from gaussreg_tpu.gs.fine_registration import (
    default_cameras,
    fine_register,
    to_device_gaussians,
)
from gaussreg_tpu.gs.fusion import gaussian_fuse  # noqa: F401 (re-export)
from gaussreg_tpu.gs.ply import load_gaussians
from gaussreg_tpu.models.metrics import unnormalize_transform
from gaussreg_tpu.models.registration import create_model


def coarse_register_clouds(
    cfg: Config,
    params,
    ref_points: np.ndarray,
    ref_feats: np.ndarray,
    src_points: np.ndarray,
    src_feats: np.ndarray,
    seed: int = 0,
) -> Dict:
    """Run the coarse model on already-normalized clouds. Returns the output
    dict with 'estimated_transform' in the normalized frame."""
    model = create_model(cfg)
    batch = make_pair_batch(cfg, ref_points, ref_feats, src_points, src_feats)
    # jit is essential: an eager apply dispatches thousands of individual ops
    # (pathological over remote-TPU transports)
    apply = jax.jit(
        lambda p, b, k: model.apply(
            p, b, train=False, with_transform=True, rngs={"ransac": k}
        )
    )
    return apply(params, batch, jax.random.PRNGKey(seed))


def register_gs_pair(
    ref_ply_path: str,
    src_ply_path: str,
    params,
    cfg: Optional[Config] = None,
    point_limit: Optional[int] = None,
    fine: bool = False,
    fine_steps: int = 100,
    max_fine_gaussians: int = 200000,
    cameras_json: Optional[str] = None,
    fine_views: int = 4,
    seed: int = 0,
) -> Dict:
    """Register two 3DGS .ply models: returns {'transform': (4, 4) similarity
    mapping src into ref's frame, ...}.

    reference flow: demo.py:126-181 — extract clouds, volume-normalize,
    coarse registration, un-normalize; optionally refine by
    render-and-compare (the reference's unreleased fine stage).
    """
    cfg = cfg or make_cfg()
    point_limit = point_limit or cfg.train.point_limit

    ref_points, ref_feats = load_point_cloud_from_gs_ply(
        ref_ply_path, point_limit, seed=seed
    )
    src_points, src_feats = load_point_cloud_from_gs_ply(
        src_ply_path, point_limit, seed=seed + 1
    )

    (
        ref_n,
        src_n,
        _rot,
        _tr,
        ref_scale,
        src_scale,
        ref_center,
        src_center,
    ) = adjust_point_cloud_volume(
        ref_points,
        src_points,
        np.eye(3),
        np.zeros(3),
        min_adjust_volume=30.0,
        apply_translation=True,
    )

    out = coarse_register_clouds(
        cfg, params, ref_n, ref_feats, src_n, src_feats, seed=seed
    )
    est = np.asarray(out["estimated_transform"])
    transform = unnormalize_transform(
        est, ref_scale, src_scale, ref_center, src_center
    )

    result = {
        "transform": transform,
        "coarse_transform": transform.copy(),
        "normalized_transform": est,
        "ransac_inliers": int(out["ransac_inliers"]),
        "num_correspondences": int(out["num_correspondences"]),
        # original-frame extracted clouds (features = [opacity, R, G, B]) —
        # what the reference demo writes back out (demo.py:162-180)
        "ref_points": ref_points,
        "ref_colors": ref_feats[:, 1:4],
        "src_points": src_points,
        "src_colors": src_feats[:, 1:4],
    }

    if fine:
        ref_g = to_device_gaussians(load_gaussians(ref_ply_path), max_fine_gaussians)
        src_g = to_device_gaussians(load_gaussians(src_ply_path), max_fine_gaussians)
        # real training viewpoints when a cameras.json is available (given or
        # found next to the ref model — the fine render must compare views of
        # the REF frame, so ref's cameras are the right ones); synthetic
        # orbit fallback otherwise
        cams_path = cameras_json or find_cameras_json(ref_ply_path)
        if cams_path is not None:
            cams = load_cameras_json(
                cams_path, max_cameras=fine_views, max_size=640
            )
            result["fine_cameras"] = cams_path
        else:
            cams = default_cameras(np.asarray(ref_g.means), num_views=fine_views)
        fine_out = fine_register(
            ref_g, src_g, transform, cams, num_steps=fine_steps
        )
        result["transform"] = np.asarray(fine_out.transform)
        result["fine_losses"] = np.asarray(fine_out.losses)

    return result


def write_demo_outputs(output_dir: str, result: Dict) -> List[str]:
    """Write the reference demo's point-cloud artifacts (demo.py:171-180):
    `point_cloud_src_org.ply` / `point_cloud_ref.ply` (original frames) and
    `point_cloud_src.ply` (src mapped into ref's frame by the estimated
    similarity), plus `estimated_transform.npz`."""
    import os

    from gaussreg_tpu.utils.pointcloud import apply_transform_np
    from gaussreg_tpu.utils.visualization import write_point_cloud

    os.makedirs(output_dir, exist_ok=True)
    paths = []

    def _write(name, points, colors):
        p = os.path.join(output_dir, name)
        write_point_cloud(p, np.asarray(points), np.asarray(colors))
        paths.append(p)

    _write("point_cloud_src_org.ply", result["src_points"], result["src_colors"])
    _write("point_cloud_ref.ply", result["ref_points"], result["ref_colors"])
    aligned = apply_transform_np(
        np.asarray(result["src_points"]), np.asarray(result["transform"])
    )
    _write("point_cloud_src.ply", aligned, result["src_colors"])
    npz = os.path.join(output_dir, "estimated_transform.npz")
    np.savez(npz, estimated_transform=result["transform"])
    paths.append(npz)
    return paths
