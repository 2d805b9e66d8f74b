"""Tests for the auxiliary library components (reference parity sweep)."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from gaussreg_tpu.ops.misc import index_select, vector_angle
from gaussreg_tpu.ops.partition import (
    ball_query_partition,
    get_point_to_node_indices,
    knn_partition,
)
from gaussreg_tpu.models.kpconv import global_avgpool, knn_interpolate
from gaussreg_tpu.models.matching import (
    dense_to_node_correspondences,
    patch_overlap_ratios,
    point_matching_topk,
)
from gaussreg_tpu.models.metrics import (
    anisotropic_transform_error,
    inlier_ratio,
    modified_chamfer_distance,
    overlap_ratio,
)
from gaussreg_tpu.utils import pointcloud as pc
from gaussreg_tpu.utils.visualization import (
    write_correspondences_obj,
    write_point_cloud,
)
from gaussreg_tpu.engine.loops import cycle_loader, run_iterations


def test_index_select_and_vector_angle():
    vals = jnp.arange(12.0).reshape(4, 3)
    out = index_select(vals, jnp.asarray([[0, 2], [1, 3]]), axis=0)
    assert out.shape == (2, 2, 3)
    a = jnp.asarray([1.0, 0.0, 0.0])
    b = jnp.asarray([0.0, 1.0, 0.0])
    np.testing.assert_allclose(float(vector_angle(a, b)), np.pi / 2, atol=1e-6)
    np.testing.assert_allclose(float(vector_angle(a, a)), 0.0, atol=1e-6)


def test_partition_variants():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 1, (50, 3)).astype(np.float32))
    nodes = jnp.asarray(rng.uniform(0, 1, (8, 3)).astype(np.float32))
    pm = jnp.ones(50, bool)
    nm = jnp.ones(8, bool)
    idx, counts = get_point_to_node_indices(pts, nodes, pm, nm)
    assert int(jnp.sum(counts)) == 50
    sq, kidx = knn_partition(pts, nodes, pm, nm, k=5)
    assert kidx.shape == (8, 5)
    bidx, bmask, sizes = ball_query_partition(pts, nodes, pm, nm, 0.3, 5)
    assert (np.asarray(sizes) <= 5).all()
    # ball query results are within radius
    for m in range(8):
        for j, ok in zip(np.asarray(bidx)[m], np.asarray(bmask)[m]):
            if ok:
                d = np.linalg.norm(np.asarray(pts)[j] - np.asarray(nodes)[m])
                assert d < 0.3 + 1e-5


def test_knn_interpolate_and_global_avgpool():
    rng = np.random.default_rng(1)
    s_points = jnp.asarray(rng.uniform(0, 1, (1, 20, 3)).astype(np.float32))
    s_feats = jnp.asarray(rng.normal(size=(1, 20, 4)).astype(np.float32))
    q_points = s_points[:, :5] + 1e-4
    nbr = jnp.tile(jnp.arange(3)[None, None, :], (1, 5, 1))
    out = knn_interpolate(s_feats, q_points, s_points, nbr, k=3)
    assert out.shape == (1, 5, 4)
    # query exactly at a support point: interpolation ~= that point's feats
    nbr0 = jnp.asarray([[[0, 1, 2]]])
    out0 = knn_interpolate(s_feats, s_points[:, :1], s_points, nbr0, k=3)
    np.testing.assert_allclose(np.asarray(out0[0, 0]), np.asarray(s_feats[0, 0]), atol=1e-2)

    mask = jnp.asarray([[True] * 10 + [False] * 10])
    avg = global_avgpool(s_feats, mask)
    np.testing.assert_allclose(
        np.asarray(avg[0]), np.asarray(s_feats[0, :10]).mean(0), atol=1e-6
    )


def test_point_matching_topk_selects_diagonal():
    p, k = 4, 8
    rng = np.random.default_rng(2)
    ref = jnp.asarray(rng.normal(size=(p, k, 3)).astype(np.float32))
    src = jnp.asarray(rng.normal(size=(p, k, 3)).astype(np.float32))
    scores = np.full((p, k, k), -9.0, np.float32)
    for i in range(k):
        scores[:, i, i] = -0.1
    masks = jnp.ones((p, k), bool)
    r, s, sc, valid = point_matching_topk(
        ref, src, masks, masks, jnp.asarray(scores), max_correspondences=64
    )
    assert int(valid.sum()) == p * k
    got_r = np.asarray(r)[np.asarray(valid)]
    got_s = np.asarray(s)[np.asarray(valid)]
    # selected pairs are diagonal entries
    all_pairs = {(tuple(np.round(a, 4)), tuple(np.round(b, 4))) for a, b in
                 zip(np.asarray(ref).reshape(-1, 3), np.asarray(src).reshape(-1, 3))}
    for a, b in zip(got_r, got_s):
        assert (tuple(np.round(a, 4)), tuple(np.round(b, 4))) in all_pairs


def test_dense_to_node_and_overlap_ratios():
    rng = np.random.default_rng(3)
    ref_pts = jnp.asarray(rng.uniform(0, 1, (40, 3)).astype(np.float32))
    src_pts = ref_pts + 0.001
    nodes = jnp.asarray(rng.uniform(0, 1, (4, 3)).astype(np.float32))
    mask = jnp.ones(40, bool)
    corr_ref = jnp.arange(40)
    corr_src = jnp.arange(40)
    counts, scores = dense_to_node_correspondences(
        ref_pts, src_pts, nodes, nodes, corr_ref, corr_src, mask, (mask, mask)
    )
    assert float(counts.sum()) == 40
    # identical clouds: diagonal node pairs dominate
    assert (np.argmax(np.asarray(counts), axis=1) == np.arange(4))[
        np.asarray(counts).max(1) > 0
    ].all()

    ref_knn = jnp.asarray(rng.normal(size=(3, 10, 3)).astype(np.float32))
    ratios = patch_overlap_ratios(
        ref_knn, ref_knn, jnp.ones((3, 10), bool), jnp.ones((3, 10), bool),
        jnp.eye(4), 0.05,
    )
    np.testing.assert_allclose(np.asarray(ratios[0]), 1.0)


def test_extra_metrics():
    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
    eye = jnp.eye(4)
    r = Rotation.from_rotvec([0.05, 0, 0]).as_matrix().astype(np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = r
    rm, ram, tm, tam = anisotropic_transform_error(eye, jnp.asarray(m))
    assert float(ram) > 0.5  # ~2.9 deg on one axis / 3
    ir = inlier_ratio(pts, pts, jnp.ones(30, bool), eye, 0.01)
    np.testing.assert_allclose(float(ir), 1.0)
    ov = overlap_ratio(pts, pts, jnp.ones(30, bool), jnp.ones(30, bool), eye, 0.01)
    np.testing.assert_allclose(float(ov), 1.0)
    ch = modified_chamfer_distance(pts, pts, pts, eye, eye)
    assert float(ch) < 1e-6


def test_numpy_pointcloud_utils():
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    d = pc.get_nearest_neighbor(pts + 0.001, pts)
    assert d.max() < 0.01
    r = pc.random_sample_rotation(rng=rng)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    m = pc.get_transform_from_rotation_translation(r, np.ones(3))
    inv = pc.inverse_transform_np(m)
    np.testing.assert_allclose(m @ inv, np.eye(4), atol=1e-5)
    r2, t2, s2 = pc.get_rotation_translation_from_transform_w_scale(
        pc.get_transform_from_rotation_translation(2.0 * r, np.ones(3))
    )
    np.testing.assert_allclose(s2, 2.0, rtol=1e-5)
    # keypoint NMS keeps separated points
    scores = rng.uniform(size=100)
    kp = pc.sample_keypoints_nms(pts, scores, 10, radius=0.5)
    sel = pts[kp]
    dd = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
    np.fill_diagonal(dd, np.inf)
    assert dd.min() >= 0.5
    # depth unprojection roundtrip
    intr = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = np.full((48, 64), 2.0)
    cloud = pc.depth_to_points(depth, intr)
    assert cloud.shape[0] == 48 * 64
    np.testing.assert_allclose(cloud[:, 2], 2.0)
    # correspondences of identical clouds include the identity pairs
    corr = pc.get_correspondences(pts, pts, np.eye(4), 0.01)
    assert set(map(tuple, corr)) >= {(i, i) for i in range(100)}


def test_visualization_writers(tmp_path):
    rng = np.random.default_rng(6)
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    write_point_cloud(str(tmp_path / "c.ply"), pts, np.ones((20, 3)) * 0.5)
    assert (tmp_path / "c.ply").exists()
    write_correspondences_obj(
        str(tmp_path / "corr.obj"), pts, pts + 1, np.ones(20, bool)
    )
    text = (tmp_path / "corr.obj").read_text()
    assert text.count("l ") == 20


def test_iteration_loop():
    def make_iter(epoch):
        return iter(range(3))

    it = cycle_loader(make_iter)
    logs = []

    def step(state, batch):
        return state + batch, {"loss": float(batch)}

    final = run_iterations(
        0, it, step, max_iterations=7, log_steps=2,
        on_log=lambda i, m: logs.append((i, m["loss"])),
    )
    assert final == 0 + (0 + 1 + 2) * 2 + 0  # 7 items of the 0,1,2 cycle
    assert len(logs) == 3
