"""End-to-end plumbing test: two GS .ply models -> register_gs_pair ->
gaussian_fuse (BASELINE configs 1 + 2). Uses an untrained model with a tiny
config — validates the full IO/extraction/normalization/registration/fusion
pipeline fits together, not registration quality."""

import numpy as np
import jax
import pytest
from scipy.spatial.transform import Rotation

from gaussreg_tpu.config import make_tiny_cfg
from gaussreg_tpu.gs.ply import GaussianModel, load_gaussians, save_gaussians


def _make_scene_model(n=1200, seed=0):
    rng = np.random.default_rng(seed)
    # box-ish scene with opaque gaussians
    xyz = rng.uniform(0, 3.0, size=(n, 3)).astype(np.float32)
    return GaussianModel(
        xyz=xyz,
        f_dc=rng.normal(scale=0.3, size=(n, 3, 1)).astype(np.float32),
        f_rest=rng.normal(scale=0.02, size=(n, 3, 15)).astype(np.float32),
        opacity=np.full((n, 1), 2.5, np.float32),
        scales=rng.normal(-3.0, 0.2, size=(n, 3)).astype(np.float32),
        rots=rng.normal(size=(n, 4)).astype(np.float32),
    )


def test_register_and_fuse_plumbing(tmp_path):
    from gaussreg_tpu.api import register_gs_pair
    from gaussreg_tpu.data.pipeline import make_pair_batch
    from gaussreg_tpu.data.synthetic import random_pair
    from gaussreg_tpu.gs.fusion import gaussian_fuse
    from gaussreg_tpu.models.registration import create_model

    cfg = make_tiny_cfg()
    g_ref = _make_scene_model(seed=1)

    # src = same scene transformed by a similarity
    r = Rotation.random(random_state=2).as_matrix().astype(np.float32)
    s = 1.4
    t = np.array([0.5, -0.2, 0.8], np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = s * r
    m[:3, 3] = t
    inv = np.linalg.inv(m)
    g_src = GaussianModel(
        xyz=(g_ref.xyz @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32),
        f_dc=g_ref.f_dc,
        f_rest=g_ref.f_rest,
        opacity=g_ref.opacity,
        scales=g_ref.scales - np.log(s),
        rots=g_ref.rots,
    )

    ref_ply = str(tmp_path / "ref.ply")
    src_ply = str(tmp_path / "src.ply")
    save_gaussians(ref_ply, g_ref)
    save_gaussians(src_ply, g_src)

    model = create_model(cfg)
    rp, rf, sp, sf, mm = random_pair(cfg, 0, num_points=700)
    example = make_pair_batch(cfg, rp, rf, sp, sf, mm)
    init = jax.jit(
        lambda k, b: model.init(
            {"params": k, "sample": k, "ransac": k}, b, train=False,
            with_transform=False,
        )
    )
    params = init(jax.random.PRNGKey(0), example)

    result = register_gs_pair(ref_ply, src_ply, params, cfg, point_limit=700)
    est = result["transform"]
    assert est.shape == (4, 4)
    assert np.isfinite(est).all()
    assert result["ransac_inliers"] >= 0

    # demo output parity (reference demo.py:171-180): original ref/src clouds
    # and the transformed src cloud land on disk next to the npz
    from gaussreg_tpu.api import write_demo_outputs
    from gaussreg_tpu.gs.ply import read_ply_vertex
    from gaussreg_tpu.utils.pointcloud import apply_transform_np

    out_dir = str(tmp_path / "demo_out")
    paths = write_demo_outputs(out_dir, result)
    names = {p.split("/")[-1] for p in paths}
    assert names == {
        "point_cloud_src_org.ply",
        "point_cloud_ref.ply",
        "point_cloud_src.ply",
        "estimated_transform.npz",
    }
    src_org = read_ply_vertex(str(tmp_path / "demo_out/point_cloud_src_org.ply"))
    src_tr = read_ply_vertex(str(tmp_path / "demo_out/point_cloud_src.ply"))
    org = np.stack([src_org["x"], src_org["y"], src_org["z"]], axis=1)
    tr = np.stack([src_tr["x"], src_tr["y"], src_tr["z"]], axis=1)
    np.testing.assert_allclose(
        tr, apply_transform_np(org, est), rtol=1e-4, atol=1e-4
    )
    assert {"red", "green", "blue"} <= set(src_tr.keys())

    # fusion with the GT transform produces a merged, valid model
    tpath = str(tmp_path / "t.npz")
    np.savez(tpath, estimated_transform=m)
    fused_path = str(tmp_path / "fused.ply")
    gaussian_fuse(ref_ply, src_ply, tpath, fused_path)
    fused = load_gaussians(fused_path)
    assert 0 < fused.num_gaussians <= g_ref.num_gaussians + g_src.num_gaussians
    assert np.isfinite(fused.xyz).all()
    # src points moved by the GT similarity should land inside ref's bbox
    lo, hi = g_ref.xyz.min(0) - 0.5, g_ref.xyz.max(0) + 0.5
    assert (fused.xyz > lo - 1e-3).all() and (fused.xyz < hi + 1e-3).all()
