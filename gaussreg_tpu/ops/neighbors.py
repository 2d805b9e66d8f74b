"""Fixed-capacity neighbor search (radius / knn) on device.

TPU-native replacement for the reference's nanoflann KD-tree radius search
(reference: geotransformer/extensions/cpu/radius_neighbors/radius_neighbors_cpu.cpp:36-91
and wrapper geotransformer/modules/ops/radius_search.py:7-27). nanoflann is
run with `sorted = true` (radius_neighbors_cpu.cpp:34), so the reference
returns the *nearest* `limit` within the radius — exactly what both paths
here produce, with identical sentinel semantics (sentinel index == num
support slots, reference radius_search.py:25-27).

Two exact implementations:

- brute force: blockwise gram-matmul distances + `lax.top_k` over the full
  support width. Simple, but `top_k` on TPU costs ~rows x n x k — 270 ms at
  level-0 pyramid width (measured, PERF.md).
- grid-run pruned (`grid_radius_search`, the default for large supports):
  supports are sorted by a linear cell key (cell == radius, z in the low
  bits) so each query's 27-cell neighborhood is NINE contiguous z-runs.
  Per query: 9 range probes ranked by a merge sort, LANE-ALIGNED window
  gathers covering each run, masked distances, and a two-stage top_k over
  the 9 windows. Bit-identical to brute force when no run overflows the
  gathered window; an unbiased-sample approximation (hashed within-cell
  tiebreak) when one does.

  Every gather here moves whole 128-lane-aligned rows of a 2D-reshaped
  operand. This is THE critical TPU constraint: gathering length-128
  slices at unaligned minor-dim offsets from a 1D array lowers to a
  ~2.3 us/row slow path (measured: 613 ms for one probe pass at pyramid
  scale, tools/probe_bisect.py) while aligned full-row gathers are
  row-count bound at ~2-6 ns/row — a 400x difference. The run [start,
  end) is therefore covered by the TWO aligned 128-rows containing
  [start, start+129) and the exact radius test + run-bound mask discard
  the spillover.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e12
_BITS = 10  # cell coords in [0, 1024); linear key x<<20 | y<<10 | z


def _blocked_topk_dist(q_points, s_points, s_mask, k: int, block: int):
    """Return (sq_dists, indices) of the k nearest valid support points for
    every query row. Shapes: q (M, 3), s (N, 3) -> (M, k) each."""
    m = q_points.shape[0]
    pad = (-m) % block
    q = jnp.pad(q_points, ((0, pad), (0, 0)))
    s2 = jnp.sum(s_points * s_points, axis=-1)
    s2 = jnp.where(s_mask, s2, _BIG)

    def one_block(qb):
        d2 = (
            jnp.sum(qb * qb, axis=-1)[:, None]
            - 2.0 * qb @ s_points.T
            + s2[None, :]
        )
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    qb = q.reshape(-1, block, 3)
    d2, idx = jax.lax.map(one_block, qb)
    d2 = d2.reshape(-1, k)[:m]
    idx = idx.reshape(-1, k)[:m]
    return jnp.maximum(d2, 0.0), idx


@functools.partial(jax.jit, static_argnames=("limit", "block"))
def radius_search(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    q_mask: jnp.ndarray,
    s_mask: jnp.ndarray,
    radius,
    limit: int,
    block: int = 1024,
) -> jnp.ndarray:
    """Nearest `limit` support points within `radius` of each query
    (brute-force path).

    Returns (M, limit) int32 indices into s_points, sentinel == N for
    missing/invalid neighbors (N = s_points.shape[0]).
    """
    n = s_points.shape[0]
    d2, idx = _blocked_topk_dist(q_points, s_points, s_mask, limit, block)
    ok = (d2 <= radius * radius) & q_mask[:, None]
    return jnp.where(ok, idx, n).astype(jnp.int32)


def _merge_ranks(skey, lo, hi):
    """Ranks of probe keys in the sorted support keys, by MERGE instead of
    search: one stable sort of [supports, lo-probes, hi-probes] with a
    2-bit tie-break type (lo < support < hi) yields, per probe, the number
    of supports strictly below a lo probe and <= a hi probe in a single
    pass; a second sort un-permutes the results back to probe slots.

    Sorts are the fast primitive on this hardware (a (2, 92k) 2-operand
    sort is ~0.3 ms) while both searchsorted (serial gather while-loop,
    184 ms) and brute chunk-count probing (P x nchunks compare fusions,
    ~58 ms per pass at level-0 pyramid scale — profiler trace) are not.

    skey: (B, N) ascending int32 cell keys (< 2^30).
    lo, hi: (B, P) int32 probe keys.
    Returns (starts, ends): (B, P) int32 — #(skey < lo), #(skey <= hi).
    """
    b, n = skey.shape
    p = lo.shape[1]
    k3s = (skey.astype(jnp.uint32) << 2) | jnp.uint32(1)
    k3lo = lo.astype(jnp.uint32) << 2
    k3hi = (hi.astype(jnp.uint32) << 2) | jnp.uint32(2)
    keys = jnp.concatenate([k3s, k3lo, k3hi], axis=1)  # (B, N + 2P)
    slot = jnp.concatenate(
        [
            jnp.full((b, n), n + 2 * p, jnp.int32),  # supports un-sort last
            jnp.broadcast_to(jnp.arange(2 * p, dtype=jnp.int32), (b, 2 * p)),
        ],
        axis=1,
    )
    # ONE payload, explicitly unstable (round 5: each extra sort operand —
    # including the hidden stability iota — costs ~25% at the 583k level-0
    # width). The probe flag is RECOVERED from the sorted keys' 2-bit type
    # suffix instead of riding the sort; ties are harmless: equal keys are
    # only probe/probe (identical cell + type -> identical rank either
    # order) — support keys are distinct from probe keys by the suffix.
    skeys, slots = jax.lax.sort((keys, slot), num_keys=1, is_stable=False)
    flags = ((skeys & jnp.uint32(3)) != jnp.uint32(1)).astype(jnp.int32)
    pos = jnp.broadcast_to(
        jnp.arange(n + 2 * p, dtype=jnp.int32), (b, n + 2 * p)
    )
    # supports before this position = position - probes before it.
    # associative_scan, NOT jnp.cumsum: cumsum lowers to a row-wide
    # reduce_window (583k-wide window at level-0 scale) which the TPU
    # backend executes abysmally; the explicit log-depth scan is cheap.
    nsup_below = pos - (
        jax.lax.associative_scan(jnp.add, flags, axis=1) - flags
    )
    # un-permute: slots are unique -> unstable is exact
    _, ranks = jax.lax.sort(
        (slots, nsup_below), num_keys=1, is_stable=False
    )
    return ranks[:, :p], ranks[:, p : 2 * p]


def _row_window_gather(src, rows, nrows: int):
    """Gather `nrows` consecutive rows of `src` (B, R, C) starting at row
    index `rows` (B, P) -> (B, P, nrows, C). Rows must satisfy
    rows + nrows <= R (caller pads).

    Expressed as `flat[idx]` whole-row takes (collapsed slice dim): that is
    the ONLY gather form XLA's TPU backend lowers to the fast vectorized
    path — explicit lax.gather with multi-row slice_sizes lowers to a
    SERIAL while loop (measured 78 ms per gather at 442k probes,
    tools/probe_bisect.py + profiler trace)."""
    b, r, c = src.shape
    p = rows.shape[1]
    flat = src.reshape(b * r, c)
    off = (jnp.arange(b, dtype=rows.dtype) * r)[:, None]
    parts = [flat[(rows + off + j).reshape(-1)] for j in range(nrows)]
    return jnp.stack(parts, axis=1).reshape(b, p, nrows, c)


@functools.partial(
    jax.jit,
    static_argnames=("limit", "window_rows", "select_kernel", "cell_factor"),
)
def grid_radius_search(
    q_points: jnp.ndarray,  # (B, M, 3)
    s_points: jnp.ndarray,  # (B, N, 3)
    q_mask: jnp.ndarray,  # (B, M)
    s_mask: jnp.ndarray,  # (B, N)
    radius,
    limit: int,
    window_rows: int = 2,
    select_kernel: str = "auto",  # auto|fused|pallas|topk. 'auto' uses the
    # fused window-select kernel (ops/fused_select.py) on TPU and the topk
    # branch elsewhere; 'pallas' is the legacy select_min_k path (selection
    # kernel but unfused d2/validity/index maps). NOTE: the backend is
    # resolved via jax.default_backend() at TRACE time — under a jit pinned
    # to a device that differs from the default backend, pass an explicit
    # kernel ('pallas' compiles Mosaic and requires TPU placement;
    # non-TPU backends get interpret mode only under 'auto'/default-CPU)
    cell_factor: float = 1.0,  # grid cell size as a multiple of `radius`.
    # 1.0: radius-sized cells, 3x3 xy-neighborhood -> 9 z-runs/query.
    # 2.0: double cells, [floor((q-r)/c), +1] covers the query ball with
    # a 2x2 neighborhood and a 2-cell z-window -> 4 runs/query, cutting
    # the candidate width (and every per-lane cost downstream) 2.25x.
    # Use 2.0 for SPARSE (post-voxelization) supports only: run lengths
    # grow ~8x with cell volume and the aligned windows must still cover
    # them (search_overflow counts any breach).
):
    """Batched grid-run pruned radius search (module docstring).

    Returns (indices (B, M, limit) int32 with sentinel == N,
             overflow () int32 — candidate z-run entries beyond the
             gathered aligned window).

    Each z-run [start, end) is covered by the `window_rows` aligned
    128-wide rows containing `start`, guaranteeing coverage of at least
    (window_rows - 1) * 128 + 1 run entries. When a run is longer, the
    covered prefix is a RANDOM sample of the run (supports sort with a
    hashed tiebreak), so truncation is spatially unbiased — the result is
    then the nearest `limit` of a uniform candidate sample instead of the
    exact nearest `limit`, the same kind of statistical truncation the
    reference applies via its calibrated per-level neighbor limits
    (utils/data.py:13-39). Overflowed entries are counted, never silently
    dropped.
    """
    b, m = q_points.shape[:2]
    n = s_points.shape[1]
    r2 = radius * radius
    cw = 128  # lane-aligned window row width
    wspan = window_rows * cw

    big = jnp.asarray(jnp.finfo(s_points.dtype).max, s_points.dtype)
    pmin = jnp.min(
        jnp.where(s_mask[..., None], s_points, big), axis=1, keepdims=True
    )  # (B, 1, 3)

    cs = radius * cell_factor

    def cellify(pts):
        return jnp.clip(
            jnp.floor((pts - pmin) / cs).astype(jnp.int32),
            0,
            (1 << _BITS) - 1,
        )

    s_cells = cellify(s_points)
    key = (
        (s_cells[..., 0] << (2 * _BITS))
        | (s_cells[..., 1] << _BITS)
        | s_cells[..., 2]
    )
    # invalid points sort last; 0x3FFFFFFF (the max 30-bit key) keeps every
    # key < 2^30 so _merge_ranks' 2-bit type suffix fits in uint32. It
    # aliases the (1023,1023,1023) corner cell, which no real query reaches
    # (cells are radius-sized from pmin); invalid coords are pushed to
    # `big` so they can never pass the radius test regardless.
    key = jnp.where(s_mask, key, jnp.int32(0x3FFFFFFF))
    # within-cell order: hashed tiebreak so window truncation samples the
    # run uniformly instead of keeping a spatial prefix
    iota = jnp.arange(n, dtype=jnp.uint32)
    tiebreak = (iota * jnp.uint32(2654435761)).astype(jnp.int32)
    order0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    skey, _, order = jax.lax.sort(
        (key, jnp.broadcast_to(tiebreak, (b, n)), order0), num_keys=2
    )
    svalid = jnp.take_along_axis(s_mask, order, axis=1)
    # SoA coordinate planes as 2D (B, R, cw) for aligned row gathers;
    # padding values -> far away so their d2 can never pass the radius test.
    # R covers row index start//cw + window_rows for any start <= n.
    nrow = (n + cw - 1) // cw
    r_tot = nrow + window_rows
    lpad = r_tot * cw
    planes = []
    for a in range(3):
        pa = jnp.take_along_axis(s_points[..., a], order, axis=1)
        pa = jnp.where(svalid, pa, big)
        pa = jnp.concatenate(
            [pa, jnp.full((b, lpad - n), big, pa.dtype)], axis=1
        )
        planes.append(pa.reshape(b, r_tot, cw))

    if cell_factor == 1.0:
        # radius-sized cells: 3x3 xy-neighborhood -> 9 z-runs per query
        q_cells = cellify(q_points)  # (B, M, 3)
        dxy = jnp.stack(
            jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"),
            axis=-1,
        ).reshape(9, 2)  # (9, 2)
        cx = q_cells[..., 0:1] + dxy[:, 0]
        cy = q_cells[..., 1:2] + dxy[:, 1]
        z0 = jnp.maximum(q_cells[..., 2:3] - 1, 0)
        z1 = jnp.minimum(q_cells[..., 2:3] + 1, (1 << _BITS) - 1)
        nruns = 9
    else:
        # larger cells (cs >= 2r): the ball [q - r, q + r] spans at most
        # TWO cells per axis starting at floor((q - r)/cs) -> 2x2 columns,
        # 2-cell z-window
        qraw = jnp.floor(
            (q_points - radius - pmin) / cs
        ).astype(jnp.int32)  # UNCLIPPED base cell (B, M, 3)
        dxy = jnp.stack(
            jnp.meshgrid(jnp.arange(0, 2), jnp.arange(0, 2), indexing="ij"),
            axis=-1,
        ).reshape(4, 2)
        cx = qraw[..., 0:1] + dxy[:, 0]
        cy = qraw[..., 1:2] + dxy[:, 1]
        z0 = jnp.clip(qraw[..., 2:3], 0, (1 << _BITS) - 1)
        z1 = jnp.clip(qraw[..., 2:3] + 1, 0, (1 << _BITS) - 1)
        nruns = 4
    # a run whose unclipped (x, y) fell outside the grid must be DROPPED,
    # not clipped: clipping would duplicate an in-range neighbour run and
    # top_k would return duplicate support indices
    run_ok = (
        (cx >= 0) & (cx < (1 << _BITS)) & (cy >= 0) & (cy < (1 << _BITS))
    )  # (B, M, nruns)
    cx = jnp.clip(cx, 0, (1 << _BITS) - 1)
    cy = jnp.clip(cy, 0, (1 << _BITS) - 1)
    lo_key = (cx << (2 * _BITS)) | (cy << _BITS) | z0  # (B, M, nruns)
    hi_key = (cx << (2 * _BITS)) | (cy << _BITS) | z1

    starts, ends = _merge_ranks(
        skey, lo_key.reshape(b, -1), hi_key.reshape(b, -1)
    )
    starts = starts.reshape(b, m, nruns)
    ends = ends.reshape(b, m, nruns)
    live = run_ok & q_mask[:, :, None]
    ends = jnp.where(live, ends, starts)

    # aligned windows: rows [start//cw, +window_rows) cover positions
    # [wrow*cw, wrow*cw + wspan) ⊇ [start, start + wspan - cw + 1)
    wrow = starts // cw  # (B, M, 9)
    wend = wrow * cw + wspan
    overflow = jnp.sum(jnp.maximum(ends - wend, 0))

    on_tpu = jax.default_backend() == "tpu"
    if select_kernel == "fused" or (select_kernel == "auto" and on_tpu):
        # fused path (round 5): ONE interleaved whole-row gather per plane
        # (x, y, z, original id) feeds ops/fused_select.py, which does
        # d2 + validity + k-min + id extraction in VMEM. The unfused path
        # below materializes (B, M, 9, wspan) pos/valid/d2 arrays (with
        # 1.8 ms layout copies each at level-0 scale) and maps selected
        # positions back through ~10 ns/element take_along_axis gathers
        # (22.7 + 22.6 ms for the two level-0-scale maps) — PERF.md
        # round-5 pyramid trace.
        from gaussreg_tpu.ops.fused_select import window_select_idx

        r_tot = planes[0].shape[1]
        base = wrow.reshape(b, m * nruns) + (
            jnp.arange(b, dtype=jnp.int32) * r_tot
        )[:, None]
        ridx = (
            base[:, :, None] + jnp.arange(window_rows, dtype=jnp.int32)
        ).reshape(-1)

        def win_gather(plane):
            # (b*m*9*wr, cw) -> (b*m, 9*wr*cw): run-major, offset-minor —
            # a contiguous reshape, no stack copy (PERF.md round 5)
            return plane.reshape(b * r_tot, cw)[ridx].reshape(b * m, -1)

        order_pad = jnp.concatenate(
            [order, jnp.zeros((b, r_tot * cw - n), jnp.int32)], axis=1
        ).reshape(b, r_tot, cw)
        win_x = win_gather(planes[0])
        win_y = win_gather(planes[1])
        win_z = win_gather(planes[2])
        win_idx = win_gather(order_pad)
        ls = (starts - wrow * cw).reshape(b * m, nruns)
        le = jnp.clip(ends - wrow * cw, 0, wspan).reshape(b * m, nruns)
        lsle = jnp.concatenate([ls, le], axis=1).astype(jnp.int32)
        q8 = jnp.concatenate(
            [
                q_points.reshape(b * m, 3),
                jnp.zeros((b * m, 5), q_points.dtype),
            ],
            axis=1,
        )
        d2_sel, idx = window_select_idx(
            q8, lsle, win_x, win_y, win_z, win_idx, limit,
            nruns=nruns, wspan=wspan, interpret=not on_tpu,
        )
        d2_sel = d2_sel.reshape(b, m, limit)
        idx = idx.reshape(b, m, limit)
        ok = (d2_sel <= r2) & q_mask[:, :, None]
        return jnp.where(ok, idx, n).astype(jnp.int32), overflow

    offs = jnp.arange(wspan, dtype=jnp.int32)
    pos = wrow[..., None] * cw + offs  # (B, M, nruns, wspan) global rows
    cand_valid = (pos >= starts[..., None]) & (pos < ends[..., None])
    d2 = jnp.zeros((b, m, nruns, wspan), q_points.dtype)
    wflat = wrow.reshape(b, m * nruns)
    for a in range(3):
        ca = _row_window_gather(planes[a], wflat, window_rows).reshape(
            b, m, nruns, wspan
        )
        diff = ca - q_points[:, :, None, None, a]
        d2 = d2 + diff * diff
    d2 = jnp.where(cand_valid, d2, _BIG)
    use_pallas = select_kernel == "pallas"
    if use_pallas:
        # Pallas selection kernel: lax.top_k lowers to a full stable sort
        # with an iota payload (~190 ms at (2,30720,9,256) — device trace,
        # tools/trace_pyramid.py); extracting `limit` row minima from a
        # VMEM block is pure VPU work. Flat position (run-major,
        # window-offset-minor) reproduces the two-stage top_k tie order
        # exactly.
        from gaussreg_tpu.ops.select_k import select_min_k

        vals, pos = select_min_k(
            d2.reshape(b * m, nruns * wspan), limit, interpret=not on_tpu
        )
        d2_sel = vals.reshape(b, m, limit)
        run = (pos // wspan).reshape(b, m, limit)
        within_run = (pos % wspan).reshape(b, m, limit)
    else:
        # two-stage exact top-k: nearest `limit` per run first, then merge
        # the 9 winners — ~2x cheaper than one top_k over the full 9*wspan
        # width (the per-run winners are an exact superset of the global
        # winners)
        kk = min(limit, wspan)
        neg1, slot1 = jax.lax.top_k(-d2, kk)  # (B, M, nruns, kk)
        neg, slot2 = jax.lax.top_k(neg1.reshape(b, m, nruns * kk), limit)
        d2_sel = -neg
        run = slot2 // kk
        within_run = jnp.take_along_axis(
            slot1.reshape(b, m, nruns * kk), slot2, axis=-1
        )  # offset within the run's window
    picked = jnp.take_along_axis(wrow, run, axis=-1) * cw + within_run
    idx = jnp.take_along_axis(
        order, jnp.minimum(picked, n - 1).reshape(b, -1), axis=1
    ).reshape(b, m, limit)  # back to original support ids
    ok = (d2_sel <= r2) & q_mask[:, :, None]
    return jnp.where(ok, idx, n).astype(jnp.int32), overflow


@functools.partial(jax.jit, static_argnames=("k", "block"))
def knn_search(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    q_mask: jnp.ndarray,
    s_mask: jnp.ndarray,
    k: int,
    block: int = 1024,
):
    """k nearest valid support points per query.

    Returns (indices (M, k) int32 with sentinel N, sq_dists (M, k)).
    Invalid queries get all-sentinel rows.
    """
    n = s_points.shape[0]
    d2, idx = _blocked_topk_dist(q_points, s_points, s_mask, k, block)
    ok = (d2 < _BIG / 2) & q_mask[:, None]
    return jnp.where(ok, idx, n).astype(jnp.int32), d2


def gather_padded(values: jnp.ndarray, indices: jnp.ndarray, fill=0.0) -> jnp.ndarray:
    """Gather rows of `values` (N, ...) at `indices` (...,) where sentinel
    index == N returns `fill` (the reference emulates this by concatenating a
    zero/inf row, e.g. modules/kpconv/kpconv.py:91,103)."""
    n = values.shape[0]
    clipped = jnp.minimum(indices, n - 1)
    out = jnp.take(values, clipped, axis=0)
    sentinel = (indices == n).reshape(indices.shape + (1,) * (values.ndim - 1))
    return jnp.where(sentinel, jnp.asarray(fill, values.dtype), out)
