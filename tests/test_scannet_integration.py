"""Integration test of the ScanNet-GSReg on-disk path (VERDICT r2 #7).

Builds a tiny fake dataset tree with the reference's exact layout
(reference datasets/.../dataset.py:57-68, README.md:77-113):

    <root>/train.pkl, <root>/test.pkl
    <root>/test_transformations.npz
    <root>/<subset>/<scene>/{A,B}/output/point_cloud/iteration_10000/point_cloud.ply

then exercises ScanNetGSRegDataset (both subsets) and the eval_scannet CLI
end to end, so the pkl/npz branch and the un-normalization path
(reference test.py:146-198) execute in CI.
"""

import os
import pickle
import runpy
import sys

import numpy as np
import pytest

from gaussreg_tpu.gs.ply import GaussianModel, save_gaussians

SCENES = ["scene0707_00", "scene0708_00"]


def _random_gaussians(rng, n=900, extent=(3.0, 2.4, 3.0)):
    xyz = (rng.uniform(size=(n, 3)) * np.asarray(extent)).astype(np.float32)
    f_dc = rng.normal(scale=0.5, size=(n, 3, 1)).astype(np.float32)
    f_rest = rng.normal(scale=0.05, size=(n, 3, 15)).astype(np.float32)
    # opacity logits: most pass sigmoid > 0.7 (logit > 0.847), some fail
    opacity = rng.uniform(0.0, 4.0, size=(n, 1)).astype(np.float32)
    scales = rng.normal(scale=0.3, size=(n, 3)).astype(np.float32) - 4.0
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    return GaussianModel(xyz, f_dc, f_rest, opacity, scales, rots)


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet_gsreg")
    rng = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation

    train_meta, test_meta = [], []
    ref_tl, src_tl, gt_tl = {}, {}, {}
    for subset in ("train", "test"):
        for si, scene in enumerate(SCENES):
            base = _random_gaussians(rng)
            # B = A under a similarity transform (with per-model jitter)
            s = 1.3
            r = Rotation.random(random_state=si).as_matrix().astype(np.float32)
            t = np.float32([0.4, -0.2, 0.1])
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] = s * r
            m[:3, 3] = t
            inv = np.linalg.inv(m)
            b_xyz = base.xyz @ inv[:3, :3].T + inv[:3, 3]
            gb = GaussianModel(
                b_xyz.astype(np.float32), base.f_dc, base.f_rest,
                base.opacity, base.scales, base.rots,
            )
            for tag, g in (("A", base), ("B", gb)):
                p = os.path.join(
                    str(root), subset, scene, tag,
                    "output", "point_cloud", "iteration_10000",
                )
                os.makedirs(p, exist_ok=True)
                save_gaussians(os.path.join(p, "point_cloud.ply"), g)
            rel = f"{subset}/{scene}"
            meta = {
                "scene_name": scene,
                "frag_id0": 0,
                "frag_id1": 1,
                "overlap": 0.9,
                "pcd0": f"{rel}/A/output/point_cloud/iteration_10000/point_cloud.ply",
                "pcd1": f"{rel}/B/output/point_cloud/iteration_10000/point_cloud.ply",
                "rotation": m[:3, :3].copy(),
                "translation": m[:3, 3].copy(),
            }
            if subset == "train":
                train_meta.append(meta)
            else:
                test_meta.append(meta)
                ref_tl[scene] = np.eye(4, dtype=np.float32)
                src_tl[scene] = np.eye(4, dtype=np.float32)
                gt_tl[scene] = m

    with open(root / "train.pkl", "wb") as f:
        pickle.dump(train_meta, f)
    with open(root / "test.pkl", "wb") as f:
        pickle.dump(test_meta, f)
    np.savez(
        root / "test_transformations.npz",
        transformations={
            "ref_transformations_list": ref_tl,
            "src_transformations_list": src_tl,
            "gt_transformations_list": gt_tl,
        },
    )
    return str(root)


def test_train_subset_loads_and_augments(fake_root):
    from gaussreg_tpu.data.scannet import ScanNetGSRegDataset

    ds = ScanNetGSRegDataset(
        fake_root, "train", point_limit=600, use_augmentation=True, seed=3
    )
    assert len(ds) == len(SCENES)
    item = ds[0]
    assert item["ref_points"].shape[1] == 3
    assert item["ref_points"].shape[0] <= 600
    assert item["ref_feats"].shape == (item["ref_points"].shape[0], 4)
    # features = [opacity, RGB 0..255]
    assert item["ref_feats"][:, 0].min() > 0.7
    assert 0.0 <= item["ref_feats"][:, 1:].min()
    assert item["ref_feats"][:, 1:].max() <= 255.0
    # volume normalization puts both clouds in [10, 50] m^3
    for k in ("ref_points", "src_points"):
        ext = item[k].max(0) - item[k].min(0)
        vol = float(ext[0] * ext[1] * ext[2])
        assert 9.0 < vol < 51.0, (k, vol)
    # the adjusted GT transform maps src onto ref
    tr = item["transform"]
    src_t = item["src_points"] @ tr[:3, :3].T + tr[:3, 3]
    from scipy.spatial import cKDTree

    d, _ = cKDTree(item["ref_points"]).query(src_t)
    assert np.median(d) < 0.2


def test_test_subset_uses_npz_transformations(fake_root):
    from gaussreg_tpu.data.scannet import ScanNetGSRegDataset

    ds = ScanNetGSRegDataset(fake_root, "test", point_limit=600)
    assert len(ds) == len(SCENES)
    item = ds[0]
    # test subset recenters each cloud (apply_translation=True)
    for k in ("ref_points", "src_points"):
        center = (item[k].max(0) + item[k].min(0)) / 2
        assert np.abs(center).max() < 1e-3
    assert item["ref_adjust_scale"] > 0
    assert item["src_adjust_scale"] > 0


def test_eval_scannet_cli_end_to_end(fake_root, tmp_path, capsys, monkeypatch):
    """tools/eval_scannet.py --tiny runs the full pkl/npz + un-normalization
    path (reference test.py:120-216) on the fake dataset."""
    out = str(tmp_path / "eval_out")
    monkeypatch.setattr(
        sys, "argv",
        [
            "eval_scannet.py",
            "--scannet_path", fake_root,
            "--output_path", out,
            "--num_sample", "600",
            "--limit_scenes", "2",
            "--tiny",
        ],
    )
    runpy.run_path(
        os.path.join(os.path.dirname(__file__), "..", "tools", "eval_scannet.py"),
        run_name="__main__",
    )
    captured = capsys.readouterr().out
    assert "rre_avg:" in captured
    assert "rse < 0.2:" in captured
    est = np.load(
        os.path.join(out, "estimated_transform.npz"), allow_pickle=True
    )["estimated_transform_list"].item()
    assert set(est) == set(SCENES)
    for scene, t in est.items():
        assert t.shape == (4, 4)
        assert np.all(np.isfinite(t))


def test_released_weights_eval_end_to_end(fake_root, tmp_path, capsys, monkeypatch):
    """The reference deliverable workflow (README.md:115-124): download a
    pretrained snapshot -> test.py. One piece in CI: full-format torch
    snapshot -> convert -> per-layer-geometry model rebuild -> eval over the
    fake ScanNet tree -> recall printout (VERDICT r3 missing #2)."""
    torch = pytest.importorskip("torch")
    from gaussreg_tpu.engine.torch_import import fake_reference_state_dict

    sd = {k: torch.from_numpy(v) for k, v in fake_reference_state_dict().items()}
    snap = str(tmp_path / "snapshot.pth.tar")
    # reference snapshot format: base_trainer.py:112-165 ({'model': state,
    # 'epoch': ..., 'iteration': ...})
    torch.save({"model": sd, "epoch": 40, "iteration": 12345}, snap)

    out = str(tmp_path / "eval_out")
    monkeypatch.setattr(
        sys, "argv",
        [
            "eval_scannet.py",
            "--scannet_path", fake_root,
            "--output_path", out,
            "--num_sample", "600",
            "--limit_scenes", "1",
            "--tiny_capacities",
            "--torch_snapshot", snap,
        ],
    )
    runpy.run_path(
        os.path.join(os.path.dirname(__file__), "..", "tools", "eval_scannet.py"),
        run_name="__main__",
    )
    captured = capsys.readouterr().out
    # conversion happened, per-layer geometry was detected (reference
    # checkpoints carry per-layer random kernel rotations), and the eval
    # printed its recall table
    assert "torch import:" in captured
    assert "per_layer_geometry=True" in captured
    assert "rre_avg:" in captured
    assert "rse < 0.2:" in captured
    est = np.load(
        os.path.join(out, "estimated_transform.npz"), allow_pickle=True
    )["estimated_transform_list"].item()
    for t in est.values():
        assert t.shape == (4, 4)
        assert np.all(np.isfinite(t))
