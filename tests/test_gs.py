import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from gaussreg_tpu.gs.ply import GaussianModel, save_gaussians
from gaussreg_tpu.gs.extract import (
    adjust_point_cloud_volume,
    extract_point_cloud,
    load_point_cloud_from_gs_ply,
)
from gaussreg_tpu.gs.fusion import fuse_gaussians, transform_gaussians
from gaussreg_tpu.ops.transforms import quaternion_to_matrix
import jax.numpy as jnp


def _make_model(n=500, seed=0, opacity_logit=3.0):
    rng = np.random.default_rng(seed)
    return GaussianModel(
        xyz=rng.uniform(0, 4, size=(n, 3)).astype(np.float32),
        f_dc=rng.normal(scale=0.3, size=(n, 3, 1)).astype(np.float32),
        f_rest=rng.normal(scale=0.05, size=(n, 3, 15)).astype(np.float32),
        opacity=np.full((n, 1), opacity_logit, np.float32),
        scales=rng.normal(size=(n, 3)).astype(np.float32),
        rots=rng.normal(size=(n, 4)).astype(np.float32),
    )


def test_extract_point_cloud_filters_and_features():
    g = _make_model()
    # make 50 gaussians transparent: they must be dropped
    g.opacity[:50] = -3.0
    pts, feats = extract_point_cloud(g)
    assert pts.shape[0] == feats.shape[0]
    assert pts.shape[0] < g.num_gaussians - 50 + 1
    assert feats.shape[1] == 4
    assert (feats[:, 0] > 0.7).all()  # opacity after sigmoid
    assert (feats[:, 1:] >= 0).all() and (feats[:, 1:] <= 255).all()


def test_load_point_cloud_with_limit(tmp_path):
    g = _make_model(n=800)
    path = str(tmp_path / "gs.ply")
    save_gaussians(path, g)
    pts, feats = load_point_cloud_from_gs_ply(path, point_limit=100)
    assert pts.shape == (100, 3)
    assert feats.shape == (100, 4)


def test_adjust_point_cloud_volume_consistency():
    """After normalization, ref = src @ R^T + t must still hold."""
    rng = np.random.default_rng(1)
    src = rng.uniform(0, 10, size=(200, 3))  # volume 1000 >> 50
    r = Rotation.random(random_state=2).as_matrix()
    t = rng.normal(size=3)
    ref = src @ r.T + t
    ref2, src2, r2, t2, rs, ss, rc, sc = adjust_point_cloud_volume(
        ref.copy(), src.copy(), r.copy(), t.copy()
    )
    np.testing.assert_allclose(ref2, src2 @ r2.T + t2, atol=1e-6)
    vol = np.prod(ref2.max(0) - ref2.min(0))
    assert 9 <= vol <= 51


def test_transform_gaussians_consistency():
    """Transformed gaussians must represent the same scene: positions map by
    the similarity; covariance R*S must transform consistently."""
    g = _make_model(n=50, seed=3)
    r = Rotation.random(random_state=4).as_matrix().astype(np.float32)
    s = 2.0
    t = np.array([1.0, -2.0, 0.5], np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = s * r
    m[:3, 3] = t
    gt = transform_gaussians(g, m)
    np.testing.assert_allclose(gt.xyz, g.xyz @ (s * r).T + t, atol=1e-4)
    np.testing.assert_allclose(gt.scales, g.scales + np.log(s), atol=1e-5)
    # rotation composition: R_new == R @ R_old
    r_old = np.asarray(quaternion_to_matrix(jnp.asarray(g.rots)))
    r_new = np.asarray(quaternion_to_matrix(jnp.asarray(gt.rots)))
    np.testing.assert_allclose(r_new, r @ r_old, atol=1e-3)


def test_fuse_keeps_points_near_own_centroid():
    g1 = _make_model(n=300, seed=5)
    g2 = _make_model(n=300, seed=6)
    g2.xyz += 8.0  # disjoint clouds
    fused = fuse_gaussians(g1, g2, np.eye(4, dtype=np.float32))
    # disjoint clouds: nothing filtered
    assert fused.num_gaussians == 600
    # overlapping clouds: midpoint filter drops some points
    g3 = _make_model(n=300, seed=7)
    g3.xyz += 1.0
    fused2 = fuse_gaussians(g1, g3, np.eye(4, dtype=np.float32))
    assert fused2.num_gaussians < 600
