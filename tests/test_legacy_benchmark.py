"""Legacy 3DMatch-style trajectory benchmark utilities
(gaussreg_tpu/utils/legacy_benchmark.py vs reference
geotransformer/datasets/registration/ScanNet_GSReg/utils.py:15-228)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from gaussreg_tpu.utils import legacy_benchmark as lb


def _random_se3(rng):
    m = np.eye(4)
    m[:3, :3] = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    m[:3, 3] = rng.normal(size=3)
    return m


def test_log_file_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pairs = [
        dict(test_pair=[0, 3], num_fragments=10, transform=_random_se3(rng)),
        dict(test_pair=[2, 7], num_fragments=10, transform=_random_se3(rng)),
    ]
    path = str(tmp_path / "traj.log")
    lb.write_log_file(path, pairs)
    loaded = lb.read_log_file(path)
    assert len(loaded) == 2
    for a, b in zip(pairs, loaded):
        assert a["test_pair"] == b["test_pair"]
        assert a["num_fragments"] == b["num_fragments"]
        np.testing.assert_allclose(a["transform"], b["transform"], atol=1e-6)


def test_info_file_parse(tmp_path):
    rng = np.random.default_rng(1)
    cov = rng.normal(size=(6, 6))
    cov = cov @ cov.T
    lines = ["4 9 12\n"] + [
        " ".join(f"{v:.9e}" for v in row) + "\n" for row in cov
    ]
    path = tmp_path / "gt.info"
    path.write_text("".join(lines))
    loaded = lb.read_info_file(str(path))
    assert loaded[0]["test_pair"] == [4, 9]
    np.testing.assert_allclose(loaded[0]["covariance"], cov, rtol=1e-6)


def test_mat2quat_matches_scipy():
    rng = np.random.default_rng(2)
    for _ in range(20):
        r = Rotation.random(random_state=int(rng.integers(1 << 30)))
        q = lb._mat2quat(r.as_matrix())
        # scipy returns (x, y, z, w); ours is (w, x, y, z), w >= 0
        qs = r.as_quat()
        qs = np.concatenate([[qs[3]], qs[:3]])
        if qs[0] < 0:
            qs = -qs
        np.testing.assert_allclose(q, qs, atol=1e-9)
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-12)


def test_transform_error_zero_for_exact_estimate():
    rng = np.random.default_rng(3)
    gt = _random_se3(rng)
    cov = np.eye(6) * 100.0
    assert lb.compute_transform_error(gt, cov, gt) == pytest.approx(0.0, abs=1e-12)


def test_transform_error_matches_point_rmse_first_order():
    """The info matrix from calibrate_ground_truth makes the weighted error
    approximate the summed squared point displacement / cov[0,0]."""
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(400, 3))
    gt = np.eye(4)
    overlap, info = lb.calibrate_ground_truth(pts, pts, gt, voxel_size=0.1)
    assert overlap == pytest.approx(1.0)
    # small perturbation: translation dt and rotation omega
    dt = np.array([2e-3, -1e-3, 1.5e-3])
    omega = np.array([1e-3, -2e-3, 0.5e-3])
    est = np.eye(4)
    est[:3, :3] = Rotation.from_rotvec(omega).as_matrix()
    est[:3, 3] = dt
    err = lb.compute_transform_error(gt, info, est)
    # direct displacement sum (note quaternion imaginary part ~ omega/2 and
    # the g-matrix uses the [t, 2*q_xyz]-style parametrization: compare to
    # the analytic quadratic form instead of re-deriving the convention)
    q = lb._mat2quat(est[:3, :3])
    er = np.concatenate([dt, q[1:]])
    expected = er @ info @ er / info[0, 0]
    assert err == pytest.approx(expected, rel=1e-9)
    assert err > 0


def test_evaluate_registration_one_scene(tmp_path):
    rng = np.random.default_rng(5)
    nf = 6
    # GT: two non-adjacent pairs + one adjacent (excluded)
    gt_pairs = []
    info_pairs = []
    transforms = {}
    for (i0, i1) in [(0, 2), (1, 4), (2, 3)]:
        m = _random_se3(rng)
        transforms[(i0, i1)] = m
        gt_pairs.append(dict(test_pair=[i0, i1], num_fragments=nf, transform=m))
        info_pairs.append((i0, i1, np.eye(6) * 1000.0))
    lb.write_log_file(str(tmp_path / "gt.log"), gt_pairs)
    info_lines = []
    for i0, i1, cov in info_pairs:
        info_lines.append(f"{i0} {i1} {nf}\n")
        info_lines += [" ".join(str(v) for v in row) + "\n" for row in cov]
    (tmp_path / "gt.info").write_text("".join(info_lines))

    # results: (0,2) exact (positive), (1,4) badly wrong (negative)
    bad = _random_se3(rng)
    bad[:3, 3] += 10.0
    results = [
        dict(test_pair=[0, 2], num_fragments=nf, transform=transforms[(0, 2)]),
        dict(test_pair=[1, 4], num_fragments=nf, transform=bad),
    ]
    lb.write_log_file(str(tmp_path / "result.log"), results)

    out = lb.evaluate_registration_one_scene(
        str(tmp_path / "gt.log"),
        str(tmp_path / "gt.info"),
        str(tmp_path / "result.log"),
    )
    assert out["num_gt_pairs"] == 2  # adjacent (2,3) excluded
    assert out["num_pred_pairs"] == 2
    assert out["num_pos_pairs"] == 1
    assert out["precision"] == pytest.approx(0.5)
    assert out["recall"] == pytest.approx(0.5)
    # transforms roundtrip through float32 in the .log format
    assert out["mean_rre"] == pytest.approx(0.0, abs=5e-2)


def test_calibrate_overlap_direction():
    """Overlap counts ref points with aligned-src neighbors (reference
    utils/registration.py:180-186)."""
    rng = np.random.default_rng(6)
    ref = rng.normal(size=(200, 3))
    # src = ref shifted by the transform's inverse -> perfectly aligned
    t = np.eye(4)
    t[:3, 3] = [1.0, 0.0, 0.0]
    src = ref - t[:3, 3]
    overlap, info = lb.calibrate_ground_truth(ref, src, t, voxel_size=0.05)
    assert overlap == pytest.approx(1.0)
    assert info.shape == (6, 6)
    # info is PSD
    assert np.min(np.linalg.eigvalsh(info)) >= -1e-8


def test_scene_tables():
    assert lb.get_num_fragments("7-scenes-redkitchen") == 60
    assert lb.get_scene_abbr("7-scenes-redkitchen") == "Kitchen"
    assert lb.get_scene_abbr("unknown-scene") == "unknown-scene"
    with pytest.raises(ValueError):
        lb.get_num_fragments("unknown-scene")
