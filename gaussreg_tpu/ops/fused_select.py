"""Fused window-search selection kernel: d2 + validity + k-min + index
extraction in one VMEM pass.

Why (round-5 pyramid trace, PERF.md): the unfused pipeline materialized,
per search at level-0 scale, THREE (61440, 2304) f32 gathered coordinate
windows (with a stack copy each), a (61440, 2304) int32 position array, a
candidate-validity array, the d2 array (with {0,1}->{1,0} layout copies at
1.8 ms apiece), ran select_min_k over the d2, then mapped the selected
positions back to original support ids through per-ELEMENT
take_along_axis gathers at ~10 ns/element (22.7 + 22.6 ms for the two
level-0-scale maps alone). This kernel consumes the raw gathered window
planes directly and emits final ORIGINAL-SUPPORT-ID neighbor lists:
nothing (B*M, 9*wspan)-shaped ever reaches HBM except the four window
planes themselves, and the element-gather index maps disappear — the
index plane rides the same fast whole-row gather as the coordinates.

Selection semantics match the two-stage `lax.top_k` fallback branch in
ops/neighbors.py exactly: ascending d2, ties broken by smaller flat
(run-major, window-offset-minor) candidate position — parity-tested
against the 'topk' branch.

Reference twin: nanoflann radius search selection
(reference geotransformer/extensions/cpu/radius_neighbors/radius_neighbors_cpu.cpp:36-91).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BIG_F = float(jnp.finfo(jnp.float32).max)
_BIG_I = 2**30


def _kernel(limit: int, kpad: int, nruns: int, wspan: int):
    w = nruns * wspan

    def kernel(qx_ref, lsle_ref, wx_ref, wy_ref, wz_ref, widx_ref,
               vals_ref, idx_ref):
        br = wx_ref.shape[0]
        qx = qx_ref[:, 0:1]
        qy = qx_ref[:, 1:2]
        qz = qx_ref[:, 2:3]
        wx = wx_ref[...]
        wy = wy_ref[...]
        wz = wz_ref[...]
        dx = wx - qx
        dy = wy - qy
        dz = wz - qz
        d2 = dx * dx + dy * dy + dz * dz  # (BR, W)

        # per-candidate validity from the per-run LOCAL window bounds
        # [ls_r, le_r): lane -> (run, offset) is static (run-major layout).
        # The bounds are expanded onto the lane grid with ONE one-hot MXU
        # matmul per bound — a per-run select chain costs ~45 (BR, W) VPU
        # passes (9 runs x compare+mult+add x 2 bounds), which dominated
        # the small-k searches (round-5 trace: the k=4 upsampling search
        # cost 21 ms, mostly this fixed part). Bounds are <= wspan <= 256,
        # exact in bf16/f32.
        lane = jax.lax.broadcasted_iota(jnp.int32, (br, w), 1)
        off_f = (lane - (lane // wspan) * wspan).astype(jnp.float32)
        nrp = lsle_ref.shape[1] // 2  # padded run count (lane-safe)
        run_of_lane = jax.lax.broadcasted_iota(jnp.int32, (nrp, w), 1) // wspan
        rr = jax.lax.broadcasted_iota(jnp.int32, (nrp, w), 0)
        onehot = (run_of_lane == rr).astype(jnp.bfloat16)
        ls_w = jax.lax.dot_general(
            lsle_ref[:, :nrp].astype(jnp.bfloat16), onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        le_w = jax.lax.dot_general(
            lsle_ref[:, nrp:].astype(jnp.bfloat16), onehot,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        valid = (off_f >= ls_w) & (off_f < le_w)
        x = jnp.where(valid, d2, _BIG_F)

        widx = widx_ref[...]
        gpos = lane
        ji = jax.lax.broadcasted_iota(jnp.int32, (br, kpad), 1)

        def body(j, carry):
            x, vals, idx = carry
            m = jnp.min(x, axis=1, keepdims=True)  # (BR, 1)
            cand = jnp.where(x == m, gpos, _BIG_I)
            p = jnp.min(cand, axis=1, keepdims=True)
            sel = cand == p  # exactly the first position attaining m
            iv = jnp.min(jnp.where(sel, widx, _BIG_I), axis=1, keepdims=True)
            vals = jnp.where(ji == j, m, vals)
            idx = jnp.where(ji == j, iv, idx)
            x = jnp.where(sel, _BIG_F, x)
            return x, vals, idx

        vals0 = jnp.full((br, kpad), _BIG_F, jnp.float32)
        idx0 = jnp.full((br, kpad), _BIG_I, jnp.int32)
        _, vals, idx = jax.lax.fori_loop(
            0, limit, body, (x, vals0, idx0)
        )
        vals_ref[...] = vals
        idx_ref[...] = idx

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("limit", "nruns", "wspan", "block_rows", "interpret"),
)
def window_select_idx(
    q_xyz: jnp.ndarray,  # (P, 8) f32 — query x, y, z (cols 0..2), rest pad
    lsle: jnp.ndarray,  # (P, 2 * nruns) int32 — local window starts | ends
    win_x: jnp.ndarray,  # (P, nruns * wspan) f32 gathered candidate coords
    win_y: jnp.ndarray,
    win_z: jnp.ndarray,
    win_idx: jnp.ndarray,  # (P, nruns * wspan) int32 original support ids
    limit: int,
    nruns: int,
    wspan: int,
    block_rows: int = 128,  # fixed per-block grid/DMA overhead ~10 us
    # amortizes 4x over 32-row blocks: 39.6 -> 22.0 ms at the level-0
    # search shape (round-5 on-chip sweep); 256-row blocks exceed VMEM
    interpret: bool = False,
):
    """Row-wise nearest-`limit` selection over windowed candidates.

    Returns (d2 (P, limit) f32 ascending with finfo-max fill,
    idx (P, limit) int32 original support ids, 2**30 fill). Exact
    lax.top_k tie semantics (smaller flat candidate position wins).
    """
    p, w = win_x.shape
    assert w == nruns * wspan and w % 128 == 0, (w, nruns, wspan)
    kpad = ((limit + 127) // 128) * 128
    pad = (-p) % block_rows
    if pad:
        zf = lambda a: jnp.pad(a, ((0, pad), (0, 0)))
        q_xyz, lsle = zf(q_xyz), zf(lsle)
        win_x, win_y, win_z, win_idx = map(zf, (win_x, win_y, win_z, win_idx))
    pp = q_xyz.shape[0]
    grid = (pp // block_rows,)
    bspec = lambda c: pl.BlockSpec((block_rows, c), lambda i: (i, 0))
    vals, idx = pl.pallas_call(
        _kernel(limit, kpad, nruns, wspan),
        grid=grid,
        in_specs=[
            bspec(q_xyz.shape[1]),
            bspec(lsle.shape[1]),
            bspec(w),
            bspec(w),
            bspec(w),
            bspec(w),
        ],
        out_specs=[bspec(kpad), bspec(kpad)],
        out_shape=[
            jax.ShapeDtypeStruct((pp, kpad), jnp.float32),
            jax.ShapeDtypeStruct((pp, kpad), jnp.int32),
        ],
        interpret=interpret,
    )(q_xyz, lsle, win_x, win_y, win_z, win_idx)
    return vals[:p, :limit], idx[:p, :limit]
