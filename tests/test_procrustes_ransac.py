import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from gaussreg_tpu.ops import (
    weighted_procrustes,
    umeyama_similarity,
    ransac_similarity,
    apply_transform,
)
from gaussreg_tpu.ops.sinkhorn import log_optimal_transport


def _make_pair(seed, n=100, scale=1.0, noise=0.0):
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(n, 3)).astype(np.float32)
    r = Rotation.random(random_state=seed).as_matrix().astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    ref = scale * src @ r.T + t + noise * rng.normal(size=(n, 3)).astype(np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = scale * r
    m[:3, 3] = t
    return src, ref, m


def test_weighted_procrustes_exact():
    src, ref, gt = _make_pair(0)
    est = np.asarray(weighted_procrustes(jnp.asarray(src), jnp.asarray(ref)))
    np.testing.assert_allclose(est, gt, atol=1e-4)


def test_weighted_procrustes_ignores_zero_weight_outliers():
    src, ref, gt = _make_pair(1)
    src2 = np.concatenate([src, np.random.default_rng(9).normal(size=(20, 3))]).astype(
        np.float32
    )
    ref2 = np.concatenate([ref, np.random.default_rng(10).normal(size=(20, 3))]).astype(
        np.float32
    )
    w = np.concatenate([np.ones(100), np.zeros(20)]).astype(np.float32)
    est = np.asarray(
        weighted_procrustes(jnp.asarray(src2), jnp.asarray(ref2), jnp.asarray(w))
    )
    np.testing.assert_allclose(est, gt, atol=1e-4)


def test_weighted_procrustes_batched():
    srcs, refs, gts = [], [], []
    for s in range(4):
        src, ref, gt = _make_pair(s + 20)
        srcs.append(src), refs.append(ref), gts.append(gt)
    est = np.asarray(
        weighted_procrustes(jnp.asarray(np.stack(srcs)), jnp.asarray(np.stack(refs)))
    )
    np.testing.assert_allclose(est, np.stack(gts), atol=1e-4)


def test_umeyama_recovers_scale():
    src, ref, gt = _make_pair(2, scale=2.5)
    est = np.asarray(
        umeyama_similarity(jnp.asarray(src), jnp.asarray(ref), with_scale=True)
    )
    np.testing.assert_allclose(est, gt, atol=1e-3)


def test_ransac_similarity_with_outliers():
    src, ref, gt = _make_pair(3, scale=1.7, noise=0.002)
    rng = np.random.default_rng(11)
    n_out = 60
    src_all = np.concatenate([src, rng.normal(size=(n_out, 3)).astype(np.float32)])
    ref_all = np.concatenate([ref, rng.normal(size=(n_out, 3)).astype(np.float32)])
    mask = np.ones(src_all.shape[0], bool)
    est, inliers = ransac_similarity(
        jax.random.PRNGKey(0),
        jnp.asarray(src_all),
        jnp.asarray(ref_all),
        jnp.asarray(mask),
        distance_threshold=0.05,
        num_iterations=512,
        num_points=5,
    )
    assert int(inliers) >= 95
    aligned = np.asarray(apply_transform(jnp.asarray(src), est))
    gt_aligned = src @ gt[:3, :3].T + gt[:3, 3]
    assert np.linalg.norm(aligned - gt_aligned, axis=1).mean() < 0.02


def _numpy_sinkhorn_oracle(scores, row_masks, col_masks, alpha, iters):
    """Direct numpy port of the reference semantics
    (learnable_sinkhorn.py:13-66), used as a golden oracle."""
    inf = 1e12
    b, m, n = scores.shape
    prm = np.concatenate([~row_masks, np.zeros((b, 1), bool)], 1)
    pcm = np.concatenate([~col_masks, np.zeros((b, 1), bool)], 1)
    psm = prm[:, :, None] | pcm[:, None, :]
    padded = np.full((b, m + 1, n + 1), alpha, np.float64)
    padded[:, :m, :n] = scores
    padded[psm] = -inf
    nvr = row_masks.sum(1).astype(np.float64)
    nvc = col_masks.sum(1).astype(np.float64)
    norm = -np.log(nvr + nvc)
    log_mu = np.tile(norm[:, None], (1, m + 1))
    log_mu[:, m] = np.log(nvc) + norm
    log_mu[prm] = -inf
    log_nu = np.tile(norm[:, None], (1, n + 1))
    log_nu[:, n] = np.log(nvr) + norm
    log_nu[pcm] = -inf

    def lse(x, axis):
        xm = np.max(x, axis=axis, keepdims=True)
        return (xm + np.log(np.sum(np.exp(x - xm), axis=axis, keepdims=True))).squeeze(
            axis
        )

    u = np.zeros_like(log_mu)
    v = np.zeros_like(log_nu)
    for _ in range(iters):
        u = log_mu - lse(padded + v[:, None, :], 2)
        v = log_nu - lse(padded + u[:, :, None], 1)
    return padded + u[:, :, None] + v[:, None, :] - norm[:, None, None]


def test_sinkhorn_matches_reference_oracle():
    rng = np.random.default_rng(12)
    b, m, n = 3, 7, 9
    scores = rng.normal(size=(b, m, n)).astype(np.float64)
    row_masks = rng.random((b, m)) > 0.2
    col_masks = rng.random((b, n)) > 0.2
    row_masks[:, 0] = True
    col_masks[:, 0] = True
    alpha = 0.7
    iters = 100
    want = _numpy_sinkhorn_oracle(scores, row_masks, col_masks, alpha, iters)
    got = np.asarray(
        log_optimal_transport(
            jnp.asarray(scores),
            jnp.asarray(row_masks),
            jnp.asarray(col_masks),
            jnp.asarray(alpha),
            num_iterations=iters,
        )
    )
    valid = (want > -1e10) & (got > -1e10)
    np.testing.assert_allclose(got[valid], want[valid], atol=2e-3)  # f32 vs f64
    # after the final v-update and the -norm shift (learnable_sinkhorn.py:64),
    # every valid column of the plan sums to exactly 1 and the dustbin column
    # to the number of valid rows
    plan = np.exp(got)
    col_sums = plan.sum(1)
    for bi in range(b):
        for j in range(n):
            if col_masks[bi, j]:
                np.testing.assert_allclose(col_sums[bi, j], 1.0, rtol=1e-3)
        np.testing.assert_allclose(col_sums[bi, n], row_masks[bi].sum(), rtol=1e-3)
