"""Generic augmentation library (gaussreg_tpu/data/augment.py vs reference
geotransformer/transforms/functional.py:7-162)."""

import numpy as np
import pytest

from gaussreg_tpu.data import augment as A


@pytest.fixture
def cloud():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)) * [2.0, 1.0, 0.5] + [5.0, -3.0, 1.0]
    normals = rng.normal(size=(500, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    return pts, normals


def test_normalize_points(cloud):
    pts, _ = cloud
    out = A.normalize_points(pts)
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-9)
    assert np.max(np.linalg.norm(out, axis=1)) == pytest.approx(1.0)


def test_sample_points(cloud):
    pts, normals = cloud
    out, n_out = A.sample_points(pts, 100, normals=normals)
    np.testing.assert_array_equal(out, pts[:100])
    np.testing.assert_array_equal(n_out, normals[:100])


def test_random_sample_points_truncates_and_tiles(cloud):
    pts, _ = cloud
    rng = np.random.default_rng(1)
    out = A.random_sample_points(pts, 100, rng)
    assert out.shape == (100, 3)
    # every sampled point is an input point
    assert all(np.any(np.all(np.isclose(pts, p), axis=1)) for p in out[:5])
    # undersized cloud tiles to the requested count
    out2 = A.random_sample_points(pts[:30], 100, rng)
    assert out2.shape == (100, 3)


def test_random_scale_shift_keeps_unit_normals(cloud):
    pts, normals = cloud
    rng = np.random.default_rng(2)
    out, n_out = A.random_scale_shift_points(pts, rng, normals=normals)
    assert out.shape == pts.shape
    np.testing.assert_allclose(np.linalg.norm(n_out, axis=1), 1.0, atol=1e-9)


def test_random_rotate_up_axis_preserves_z_and_norms(cloud):
    pts, normals = cloud
    rng = np.random.default_rng(3)
    out, n_out = A.random_rotate_points_along_up_axis(pts, rng, normals=normals)
    np.testing.assert_allclose(out[:, 2], pts[:, 2], atol=1e-12)
    np.testing.assert_allclose(
        np.linalg.norm(out[:, :2], axis=1),
        np.linalg.norm(pts[:, :2], axis=1),
        atol=1e-9,
    )
    np.testing.assert_allclose(np.linalg.norm(n_out, axis=1), 1.0, atol=1e-9)


def test_random_rescale_isotropic(cloud):
    pts, _ = cloud
    rng = np.random.default_rng(4)
    out = A.random_rescale_points(pts, rng, low=0.5, high=0.5)
    np.testing.assert_allclose(out, pts * 0.5)


def test_random_jitter_points_clipped(cloud):
    pts, _ = cloud
    rng = np.random.default_rng(5)
    out = A.random_jitter_points(pts, rng, scale=1.0, noise_magnitude=0.05)
    assert np.max(np.abs(out - pts)) <= 0.05 + 1e-12
    assert not np.allclose(out, pts)


def test_random_shuffle_is_permutation(cloud):
    pts, _ = cloud
    rng = np.random.default_rng(6)
    out = A.random_shuffle_points(pts, rng)
    np.testing.assert_allclose(np.sort(out, axis=0), np.sort(pts, axis=0))


def test_random_dropout_does_not_mutate(cloud):
    pts, _ = cloud
    before = pts.copy()
    rng = np.random.default_rng(7)
    out = A.random_dropout_points(pts, rng, max_p=0.95)
    np.testing.assert_array_equal(pts, before)  # pure (reference mutates)
    dropped = np.all(np.isclose(out, pts[0]), axis=1)
    assert dropped.sum() > 1  # some points replaced by point 0


def test_random_jitter_features_prob(cloud):
    feats = np.ones((50, 4), np.float32)
    rng = np.random.default_rng(8)
    out = A.random_jitter_features(feats, rng, sigma=0.01, prob=1.0)
    assert out.dtype == feats.dtype
    assert not np.allclose(out, feats)
    out2 = A.random_jitter_features(feats, rng, sigma=0.01, prob=0.0)
    np.testing.assert_array_equal(out2, feats)


def test_plane_crop_keeps_halfspace(cloud):
    pts, _ = cloud
    rng = np.random.default_rng(9)
    normal = np.array([1.0, 0.0, 0.0])
    out = A.random_crop_points_with_plane(pts, rng, p_normal=normal, keep_ratio=0.5)
    assert out.shape[0] == 250
    # kept points are exactly the half with the largest x
    thresh = np.sort(pts @ normal)[::-1][249]
    assert np.min(out @ normal) >= thresh - 1e-12


def test_viewpoint_crop_keeps_nearest(cloud):
    pts, normals = cloud
    rng = np.random.default_rng(10)
    vp = np.array([100.0, 0.0, 0.0])
    out, n_out = A.random_crop_points_from_viewpoint(
        pts, rng, viewpoint=vp, keep_ratio=0.3, normals=normals
    )
    assert out.shape[0] == 150
    d_kept = np.linalg.norm(vp - out, axis=1)
    d_all = np.linalg.norm(vp - pts, axis=1)
    assert np.max(d_kept) <= np.sort(d_all)[149] + 1e-9


def test_random_sample_plane_unit(cloud):
    rng = np.random.default_rng(11)
    n = A.random_sample_plane(rng)
    assert np.linalg.norm(n) == pytest.approx(1.0)
