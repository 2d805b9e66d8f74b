import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from gaussreg_tpu.config import make_tiny_cfg
from gaussreg_tpu.data.pipeline import build_pyramid, make_pair_batch
from gaussreg_tpu.models.registration import create_model
from gaussreg_tpu.models.losses import overall_loss
from gaussreg_tpu.models.matching import local_to_global_registration
from gaussreg_tpu.models.metrics import isotropic_transform_error
from gaussreg_tpu.ops.ransac import ransac_similarity
from gaussreg_tpu.ops.transforms import apply_transform


def _synthetic_pair(seed=0, n=700, scale=1.6):
    rng = np.random.default_rng(seed)
    scene = rng.uniform(0, 2.0, size=(n, 3)).astype(np.float32)
    feats_ref = rng.uniform(size=(n, 4)).astype(np.float32)
    r = Rotation.random(random_state=seed).as_matrix().astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = scale * r
    m[:3, 3] = t
    # transform maps src -> ref: ref = src @ (sR)^T + t
    inv = np.linalg.inv(m)
    src = scene @ inv[:3, :3].T + inv[:3, 3]
    return scene, feats_ref, src.astype(np.float32), feats_ref.copy(), m


def test_build_pyramid_shapes_and_masks():
    cfg = make_tiny_cfg()
    ref, fr, src, fs, m = _synthetic_pair()
    batch = make_pair_batch(cfg, ref, fr, src, fs, m)
    pyr = batch.pyramid
    assert len(pyr.points) == 5
    for lvl in range(5):
        b, n, _ = pyr.points[lvl].shape
        assert b == 2 and n == cfg.capacity.levels[lvl]
        counts = np.asarray(pyr.masks[lvl]).sum(1)
        assert (counts > 0).all()
        # neighbor indices are within [0, n]
        nbr = np.asarray(pyr.neighbors[lvl])
        assert nbr.min() >= 0 and nbr.max() <= n
    # level sizes decrease
    c0 = np.asarray(pyr.masks[0]).sum(1)
    c4 = np.asarray(pyr.masks[4]).sum(1)
    assert (c4 < c0).all()


@pytest.fixture(scope="module")
def model_and_batch():
    cfg = make_tiny_cfg()
    ref, fr, src, fs, m = _synthetic_pair()
    batch = make_pair_batch(cfg, ref, fr, src, fs, m)
    model = create_model(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
         "ransac": jax.random.PRNGKey(2)},
        batch,
        train=False,
        with_transform=False,
    )
    return cfg, model, params, batch


def test_model_forward_eval(model_and_batch):
    cfg, model, params, batch = model_and_batch
    out = model.apply(
        params,
        batch,
        train=False,
        with_transform=True,
        rngs={"ransac": jax.random.PRNGKey(3)},
    )
    p = cfg.coarse_matching.num_correspondences
    k = cfg.model.num_points_in_patch
    assert out["matching_scores"].shape == (p, k + 1, k + 1)
    assert out["estimated_transform"].shape == (4, 4)
    assert np.isfinite(np.asarray(out["estimated_transform"])).all()
    assert np.isfinite(np.asarray(out["matching_scores"]).min())
    assert np.asarray(out["ref_feats_c"]).shape[-1] == cfg.geotransformer.output_dim


def test_model_forward_train_and_loss(model_and_batch):
    cfg, model, params, batch = model_and_batch
    out = model.apply(
        params,
        batch,
        train=True,
        with_transform=False,
        rngs={"sample": jax.random.PRNGKey(4)},
    )
    assert "gt_node_overlaps" in out
    ov = np.asarray(out["gt_node_overlaps"])
    assert ov.min() >= 0.0 and ov.max() <= 1.0 + 1e-5
    # identical scenes under GT transform: substantial overlaps must exist
    assert ov.max() > 0.5
    losses = overall_loss(cfg, out, batch.transform)
    assert np.isfinite(float(losses["loss"]))

    # gradient flows
    def loss_fn(p):
        o = model.apply(
            p, batch, train=True, with_transform=False,
            rngs={"sample": jax.random.PRNGKey(4)},
        )
        return overall_loss(cfg, o, batch.transform)["loss"]

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    gnorm = float(sum(jnp.sum(l**2) for l in leaves) ** 0.5)
    assert np.isfinite(gnorm) and gnorm > 0


def test_lgr_recovers_transform_with_perfect_scores():
    """Integration: feed LGR + RANSAC ideal matching scores for a known
    similarity; the estimated transform must recover it."""
    rng = np.random.default_rng(7)
    p, k = 12, 16
    r = Rotation.random(random_state=3).as_matrix().astype(np.float32)
    s = 1.8
    t = np.array([0.4, -0.2, 0.9], np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = s * r
    m[:3, 3] = t

    src_knn = rng.uniform(-1, 1, size=(p, k, 3)).astype(np.float32)
    ref_knn = src_knn @ m[:3, :3].T + m[:3, 3]
    # scores: diagonal correspondence is correct
    scores = np.full((p, k, k), -8.0, np.float32)
    for i in range(k):
        scores[:, i, i] = -0.05
    masks = np.ones((p, k), bool)
    lgr = local_to_global_registration(
        jnp.asarray(ref_knn),
        jnp.asarray(src_knn),
        jnp.asarray(masks),
        jnp.asarray(masks),
        jnp.asarray(scores),
        jnp.ones(p, bool),
        k=3,
        acceptance_radius=0.1,
        max_correspondences=256,
        max_patch_correspondences=32,
    )
    # LGR transform is rigid-only (reference procrustes has no scale); the
    # full similarity comes out of the RANSAC stage
    est, inliers = ransac_similarity(
        jax.random.PRNGKey(0),
        lgr.src_corr_points,
        lgr.ref_corr_points,
        lgr.corr_valid,
        0.05,
        num_iterations=256,
        num_points=5,
    )
    rre, rte, rse = isotropic_transform_error(jnp.asarray(m), est)
    assert float(rre) < 0.5
    assert float(rte) < 0.02
    assert float(rse) < 0.01
    assert int(inliers) >= p * k * 0.9


def test_model_output_transform_aligns_when_scores_forced():
    """Sanity: apply_transform composition on the synthetic pair: the GT
    transform really maps src onto ref."""
    ref, fr, src, fs, m = _synthetic_pair()
    aligned = np.asarray(apply_transform(jnp.asarray(src), jnp.asarray(m)))
    assert np.abs(aligned - ref).max() < 1e-4


def test_shared_geometry_matches_per_layer():
    """backbone.shared_kpconv_geometry=True must be numerically identical to
    the per-layer path when every conv uses the default deterministic kernel
    disposition (the only case the shared mode is valid for)."""
    import dataclasses

    import jax
    import numpy as np

    from gaussreg_tpu.config import make_tiny_cfg
    from gaussreg_tpu.data.pipeline import make_pair_batch
    from gaussreg_tpu.data.synthetic import random_pair
    from gaussreg_tpu.models.registration import create_model

    cfg = make_tiny_cfg()
    cfg_off = dataclasses.replace(
        cfg,
        backbone=dataclasses.replace(
            cfg.backbone, shared_kpconv_geometry=False
        ),
    )
    rp, rf, sp, sf, m = random_pair(cfg, 3, num_points=500)
    batch = make_pair_batch(cfg, rp, rf, sp, sf, m)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sample": jax.random.PRNGKey(0),
        "ransac": jax.random.PRNGKey(0),
    }
    outs = []
    params = None
    for c in (cfg, cfg_off):
        model = create_model(c)
        if params is None:
            params = jax.jit(
                lambda b: model.init(rngs, b, train=False, with_transform=False)
            )(batch)
        out = jax.jit(
            lambda p, b, mdl=model: mdl.apply(
                p, b, train=False, with_transform=False
            )
        )(params, batch)
        outs.append(np.asarray(out["ref_feats_c"]))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-4)


def test_kernel_point_generators_spread():
    """Both dispositions: center point at origin, rest inside the unit ball,
    well separated (reference kernel_points.py repulsion / spherical_Lloyd)."""
    from gaussreg_tpu.models.kpconv import (
        generate_kernel_points,
        generate_kernel_points_lloyd,
    )

    for pts in (generate_kernel_points(15), generate_kernel_points_lloyd(45)):
        assert np.allclose(pts[0], 0.0)
        r = np.linalg.norm(pts, axis=1)
        assert r.max() <= 1.0 + 1e-5
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        # no two kernel points collapse; spacing is a healthy fraction of
        # the mean nearest-neighbor distance
        nn = d.min(axis=1)
        assert nn.min() > 0.3 * nn.mean()
