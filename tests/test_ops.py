import numpy as np
import jax
import jax.numpy as jnp

from gaussreg_tpu.ops import (
    grid_subsample,
    radius_search,
    knn_search,
    point_to_node_partition,
    furthest_point_sample_host,
)
from gaussreg_tpu.ops.neighbors import gather_padded


def _pad(points, capacity):
    n = points.shape[0]
    padded = np.zeros((capacity, 3), np.float32)
    padded[:n] = points
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    return jnp.asarray(padded), jnp.asarray(mask)


def brute_voxel_centroids(points, voxel):
    pmin = points.min(0)
    coords = np.floor((points - pmin) / voxel).astype(np.int64)
    keys = {}
    for p, c in zip(points, coords):
        keys.setdefault(tuple(c), []).append(p)
    return {k: np.mean(v, axis=0) for k, v in keys.items()}


def test_grid_subsample_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
    voxel = 0.15
    p, m = _pad(pts, 384)
    out_p, out_m, nvox = grid_subsample(p, m, voxel, capacity=256)
    out_p = np.asarray(out_p)[np.asarray(out_m)]

    expected = brute_voxel_centroids(pts, voxel)
    assert int(nvox) == len(expected)
    assert out_p.shape[0] == len(expected)
    # compare as sets (voxel ordering differs from hash-map order by design)
    exp = np.array(sorted(map(tuple, expected.values())))
    got = np.array(sorted(map(tuple, out_p)))
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_grid_subsample_overflow_reported():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, size=(256, 3)).astype(np.float32)
    p, m = _pad(pts, 256)
    out_p, out_m, nvox = grid_subsample(p, m, 0.01, capacity=64)
    assert int(nvox) > 64
    assert int(np.sum(np.asarray(out_m))) == 64


def test_radius_search_matches_bruteforce():
    rng = np.random.default_rng(2)
    q = rng.uniform(0, 1, size=(40, 3)).astype(np.float32)
    s = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
    radius, limit = 0.25, 8
    qp, qm = _pad(q, 64)
    sp, sm = _pad(s, 128)
    idx = np.asarray(radius_search(qp, sp, qm, sm, radius, limit, block=32))
    assert idx.shape == (64, limit)
    for i in range(40):
        d = np.linalg.norm(s - q[i], axis=1)
        inside = set(np.where(d <= radius)[0])
        got = [j for j in idx[i] if j < 128]
        assert all(j in inside for j in got)
        # nearest-within-radius: got should be the min(limit, |inside|) closest
        want = set(np.argsort(d)[: min(limit, len(inside))]) & inside
        assert set(got) == want
    # padded queries have all-sentinel rows
    assert np.all(idx[40:] == 128)


def test_grid_radius_search_matches_bruteforce():
    from gaussreg_tpu.ops.neighbors import grid_radius_search

    rng = np.random.default_rng(7)
    radius, limit = 0.12, 10
    qs, ss, qms, sms = [], [], [], []
    for b in range(2):
        q = rng.uniform(0, 1, size=(50 - 10 * b, 3)).astype(np.float32)
        s = rng.uniform(0, 1, size=(200 - 40 * b, 3)).astype(np.float32)
        qp, qm = _pad(q, 64)
        sp, sm = _pad(s, 256)
        qs.append(qp), ss.append(sp), qms.append(qm), sms.append(sm)
    qp, sp = jnp.stack(qs), jnp.stack(ss)
    qm, sm = jnp.stack(qms), jnp.stack(sms)
    idx, overflow = grid_radius_search(qp, sp, qm, sm, radius, limit)
    assert idx.shape == (2, 64, limit)
    assert int(overflow) == 0
    # must agree with the brute-force path as sets per row (ties may reorder)
    for b in range(2):
        ref = np.asarray(radius_search(qp[b], sp[b], qm[b], sm[b], radius, limit))
        got = np.asarray(idx[b])
        nq = int(np.sum(np.asarray(qm[b])))
        for i in range(nq):
            assert set(got[i].tolist()) == set(ref[i].tolist()), (b, i)
        assert np.all(got[nq:] == 256)


def test_grid_radius_search_cell_factor2_matches_bruteforce():
    """cell_factor=2 (2x2 columns, 2-cell z-window — the sparse-level fast
    path) must stay exact vs brute force, including edge cells (queries
    near pmin where the unclipped base cell is negative)."""
    from gaussreg_tpu.ops.neighbors import grid_radius_search

    rng = np.random.default_rng(17)
    radius, limit = 0.11, 12
    q = rng.uniform(0, 1, size=(70, 3)).astype(np.float32)
    s = rng.uniform(0, 1, size=(260, 3)).astype(np.float32)
    q[0] = s.min(0)  # exercise the negative-base edge
    q[1] = s.max(0)
    qp, qm = _pad(q, 128)
    sp, sm = _pad(s, 384)
    qp, sp, qm, sm = qp[None], sp[None], qm[None], sm[None]
    idx, overflow = grid_radius_search(
        qp, sp, qm, sm, radius, limit, cell_factor=2.0
    )
    assert int(overflow) == 0
    ref = np.asarray(radius_search(qp[0], sp[0], qm[0], sm[0], radius, limit))
    got = np.asarray(idx[0])
    for i in range(70):
        assert set(got[i].tolist()) == set(ref[i].tolist()), i
    # the fused branch agrees with topk at factor 2 as well
    a, of_a = grid_radius_search(
        qp, sp, qm, sm, radius, limit, cell_factor=2.0, select_kernel="topk"
    )
    b2, of_b = grid_radius_search(
        qp, sp, qm, sm, radius, limit, cell_factor=2.0, select_kernel="fused"
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
    assert int(of_a) == int(of_b)


def test_grid_radius_search_overflow_counted():
    from gaussreg_tpu.ops.neighbors import grid_radius_search

    rng = np.random.default_rng(8)
    # 300 points crammed into one cell -> a z-run longer than the 256-wide
    # aligned candidate window
    s = (rng.uniform(0, 1, size=(300, 3)) * 0.01).astype(np.float32)
    sp, sm = _pad(s, 512)
    qp, qm = _pad(s[:4], 8)
    _, overflow = grid_radius_search(
        qp[None], sp[None], qm[None], sm[None], 0.5, 4
    )
    assert int(overflow) > 0


def test_knn_search_matches_bruteforce():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(20, 3)).astype(np.float32)
    s = rng.normal(size=(50, 3)).astype(np.float32)
    qp, qm = _pad(q, 32)
    sp, sm = _pad(s, 64)
    idx, d2 = knn_search(qp, sp, qm, sm, k=5, block=32)
    idx = np.asarray(idx)
    for i in range(20):
        d = np.linalg.norm(s - q[i], axis=1)
        want = np.argsort(d)[:5]
        np.testing.assert_array_equal(np.sort(idx[i]), np.sort(want))


def test_point_to_node_partition():
    rng = np.random.default_rng(4)
    points = rng.uniform(0, 1, size=(60, 3)).astype(np.float32)
    nodes = rng.uniform(0, 1, size=(10, 3)).astype(np.float32)
    pp, pm = _pad(points, 64)
    np_, nm = _pad(nodes, 16)
    p2n, node_masks, knn_idx, knn_masks, sizes = point_to_node_partition(
        pp, np_, pm, nm, point_limit=8
    )
    p2n = np.asarray(p2n)[:60]
    # assignment = nearest node
    want = np.argmin(
        np.linalg.norm(points[:, None] - nodes[None], axis=-1), axis=1
    )
    np.testing.assert_array_equal(p2n, want)
    # each node's knn contains only its own points
    knn_idx = np.asarray(knn_idx)
    knn_masks = np.asarray(knn_masks)
    for m in range(10):
        own = set(np.where(want == m)[0])
        got = [j for j, ok in zip(knn_idx[m], knn_masks[m]) if ok]
        assert all(j in own for j in got)
        assert len(got) == min(8, len(own))
        assert int(np.asarray(sizes)[m]) == len(own)
    # invalid node slots masked out
    assert not np.asarray(node_masks)[10:].any()


def test_gather_padded_sentinel():
    vals = jnp.arange(12.0).reshape(4, 3)
    idx = jnp.asarray([[0, 3, 4], [1, 4, 4]])
    out = np.asarray(gather_padded(vals, idx, fill=-1.0))
    np.testing.assert_allclose(out[0, 1], vals[3])
    assert np.all(out[0, 2] == -1.0)
    assert np.all(out[1, 1:] == -1.0)


def test_fps_host_spread():
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    idx = furthest_point_sample_host(pts, 50, seed=0)
    assert len(set(idx.tolist())) == 50
    # FPS should cover better than random: min pairwise distance larger
    sel = pts[idx]
    d = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    rnd = pts[rng.choice(500, 50, replace=False)]
    dr = np.linalg.norm(rnd[:, None] - rnd[None], axis=-1)
    np.fill_diagonal(dr, np.inf)
    assert d.min() > dr.min()


def test_spatial_sort_locality():
    """Morton sort keeps spatial neighbors nearby in index space."""
    from gaussreg_tpu.ops.subsample import spatial_sort

    rng = np.random.default_rng(7)
    pts = rng.uniform(0, 2.0, size=(1000, 3)).astype(np.float32)
    p, m = _pad(pts, 1024)
    sp, sm, perm = spatial_sort(p, m, 0.05)
    sp = np.asarray(sp)
    sm = np.asarray(sm)
    # permutation property: sorted points are a permutation of the input
    assert sm.sum() == 1000
    assert not sm[1000:].any() or sm.sum() == 1000
    np.testing.assert_allclose(
        np.sort(sp[sm], axis=0), np.sort(pts, axis=0), atol=0
    )
    # locality: mean index distance of the 5 nearest spatial neighbors is
    # far below the random expectation (~n/3)
    valid = sp[sm]
    d = np.linalg.norm(valid[:, None] - valid[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    nn_idx = np.argsort(d, axis=1)[:, :5]
    idx_dist = np.abs(nn_idx - np.arange(1000)[:, None]).mean()
    assert idx_dist < 200  # random order would give ~333


def test_grid_radius_search_no_duplicate_neighbors():
    """Boundary queries must not get duplicated runs (clipped (dx,dy)
    neighborhoods used to collapse onto the same z-run)."""
    from gaussreg_tpu.ops.neighbors import grid_radius_search

    rng = np.random.default_rng(11)
    # thin slab: almost every query sits on a grid boundary
    s = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
    s[:, 0] *= 0.05
    sp, sm = _pad(s, 512)
    qp, qm = _pad(s[:64], 64)
    idx, overflow = grid_radius_search(
        qp[None], sp[None], qm[None], sm[None], 0.3, 12
    )
    assert int(overflow) == 0  # window covers all runs -> exact semantics
    idx = np.asarray(idx[0])
    ref = np.asarray(radius_search(qp, sp, qm, sm, 0.3, 12))
    for i in range(64):
        real = idx[i][idx[i] < 512]
        assert len(set(real.tolist())) == len(real), (i, idx[i])
        # and they must match brute force
        assert set(real.tolist()) == set(j for j in ref[i] if j < 512)
