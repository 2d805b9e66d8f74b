"""Parity tests for the Pallas MXU segment-reduction accumulator
(gs/rasterizer/accumulate.py). It is opt-in on the render path
(GAUSSREG_ACCUM=pallas — see kernels.py for the measured XLA scheduling
regression that keeps the scatter default), but must stay exact."""

import numpy as np
import jax.numpy as jnp


def _ref(rows, gid, num_out):
    out = np.zeros((num_out, rows.shape[1]), np.float32)
    np.add.at(out, gid, rows)
    return out


def test_segment_accumulate_matches_scatter():
    from gaussreg_tpu.gs.rasterizer.accumulate import segment_accumulate

    rng = np.random.default_rng(0)
    for r_blocks, g, cg in [(23, 1000, 256), (8, 100, 512), (40, 5000, 512)]:
        r = 128 * r_blocks
        rows = rng.normal(size=(r, 16)).astype(np.float32)
        gid = rng.integers(0, g + 1, size=r).astype(np.int32)
        out = np.asarray(
            segment_accumulate(
                jnp.asarray(rows), jnp.asarray(gid), g + 1, cg=cg,
                interpret=True,
            )
        )
        np.testing.assert_allclose(
            out, _ref(rows, gid, g + 1), atol=2e-5, rtol=1e-6
        )


def test_segment_accumulate_edge_cases():
    from gaussreg_tpu.gs.rasterizer.accumulate import segment_accumulate

    rng = np.random.default_rng(1)
    r = 128 * 4
    rows = rng.normal(size=(r, 16)).astype(np.float32)
    # every row on one gaussian (longest possible run)
    gid = np.full(r, 7, np.int32)
    out = np.asarray(
        segment_accumulate(jnp.asarray(rows), jnp.asarray(gid), 64, cg=64,
                           interpret=True)
    )
    np.testing.assert_allclose(out, _ref(rows, gid, 64), rtol=3e-6)
    # empty target rows interleaved + boundary gids
    gid = (np.arange(r) % 4 * 63).astype(np.int32)  # 0, 63, 126, 189
    out = np.asarray(
        segment_accumulate(jnp.asarray(rows), jnp.asarray(gid), 190, cg=64,
                           interpret=True)
    )
    np.testing.assert_allclose(out, _ref(rows, gid, 190), atol=2e-5)
