"""Parity tests for the Pallas k-min selection kernel (ops/select_k.py)
that replaces lax.top_k in grid_radius_search on TPU. Runs in interpret
mode on the CPU test mesh."""

import numpy as np
import jax.numpy as jnp


def _pad(a, n):
    m = np.zeros(n, bool)
    m[: a.shape[0]] = True
    out = np.zeros((n,) + a.shape[1:], a.dtype)
    out[: a.shape[0]] = a
    return jnp.asarray(out), jnp.asarray(m)


def test_select_min_k_matches_topk():
    import jax

    from gaussreg_tpu.ops.select_k import select_min_k

    rng = np.random.default_rng(3)
    for r, w, k in [(7, 256, 5), (33, 2304, 35), (64, 128, 4)]:
        d2 = rng.uniform(0, 1, size=(r, w)).astype(np.float32)
        # inject ties and sentinel plateaus (the real input is mostly _BIG)
        d2[rng.uniform(size=d2.shape) < 0.6] = 1e12
        d2[0, :] = 1e12  # all-sentinel row
        if w >= 256:
            d2[1, 5] = d2[1, 200]  # exact tie across chunks
        vals, pos = select_min_k(jnp.asarray(d2), k, interpret=True)
        neg, ref_pos = jax.lax.top_k(-jnp.asarray(d2), k)
        np.testing.assert_allclose(np.asarray(vals), -np.asarray(neg))
        np.testing.assert_array_equal(np.asarray(pos), np.asarray(ref_pos))


def test_select_min_k_compiled_mosaic_parity():
    """Hardware-gated: the compiled Mosaic path (what production TPU runs)
    vs lax.top_k — interpret mode does not catch Mosaic layout/compile
    divergences (ADVICE r4). Skipped on the CPU CI mesh."""
    import jax
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU: compiled Mosaic select_min_k needs hardware")

    from gaussreg_tpu.ops.select_k import select_min_k

    rng = np.random.default_rng(5)
    d2 = rng.uniform(0, 1, size=(128, 2304)).astype(np.float32)
    d2[rng.uniform(size=d2.shape) < 0.6] = 1e12
    vals, pos = select_min_k(jnp.asarray(d2), 35, interpret=False)
    neg, ref_pos = jax.lax.top_k(-jnp.asarray(d2), 35)
    np.testing.assert_allclose(np.asarray(vals), -np.asarray(neg))
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(ref_pos))


def test_grid_radius_search_pallas_branch_matches_topk_branch():
    from gaussreg_tpu.ops.neighbors import grid_radius_search

    rng = np.random.default_rng(11)
    radius, limit = 0.12, 10
    q = rng.uniform(0, 1, size=(60, 3)).astype(np.float32)
    s = rng.uniform(0, 1, size=(220, 3)).astype(np.float32)
    qp, qm = _pad(q, 64)
    sp, sm = _pad(s, 256)
    qp, sp = qp[None], sp[None]
    qm, sm = qm[None], sm[None]
    a, of_a = grid_radius_search(
        qp, sp, qm, sm, radius, limit, select_kernel="topk"
    )
    b, of_b = grid_radius_search(
        qp, sp, qm, sm, radius, limit, select_kernel="pallas"
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(of_a) == int(of_b)


def test_grid_radius_search_fused_branch_matches_topk_branch():
    """The fused window-select kernel (ops/fused_select.py) must reproduce
    the two-stage top_k branch exactly — indices, sentinels, overflow —
    including batches, invalid queries/supports and radius-boundary ties."""
    from gaussreg_tpu.ops.neighbors import grid_radius_search

    rng = np.random.default_rng(13)
    radius, limit = 0.1, 12
    for seed in range(3):
        rng = np.random.default_rng(100 + seed)
        q = rng.uniform(0, 1, size=(2, 70, 3)).astype(np.float32)
        s = rng.uniform(0, 1, size=(2, 300, 3)).astype(np.float32)
        # clustered blob to exercise window truncation/ties
        s[0, :80] = s[0, 0] + rng.normal(scale=0.01, size=(80, 3))
        qp = np.zeros((2, 128, 3), np.float32)
        qp[:, :70] = q
        qm = np.zeros((2, 128), bool)
        qm[:, :70] = True
        sp = np.zeros((2, 384, 3), np.float32)
        sp[:, :300] = s
        sm = np.zeros((2, 384), bool)
        sm[:, :300] = True
        a, of_a = grid_radius_search(
            jnp.asarray(qp), jnp.asarray(sp), jnp.asarray(qm),
            jnp.asarray(sm), radius, limit, select_kernel="topk",
        )
        b, of_b = grid_radius_search(
            jnp.asarray(qp), jnp.asarray(sp), jnp.asarray(qm),
            jnp.asarray(sm), radius, limit, select_kernel="fused",
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(of_a) == int(of_b)
