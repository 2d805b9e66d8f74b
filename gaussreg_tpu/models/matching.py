"""Superpoint matching, GT correspondence generation, and local-to-global
registration — all statically shaped and mask-native.

reference:
- superpoint matching: geotransformer/modules/geotransformer/superpoint_matching.py:7-50
- GT patch overlaps: geotransformer/modules/registration/matching.py:230-315
- training target sampling: geotransformer/modules/geotransformer/superpoint_target.py:6-46
- LGR: geotransformer/modules/geotransformer/local_global_registration.py:11-235

The GT overlap computation is redesigned for the MXU: instead of dynamically
selecting intersecting patch pairs and computing per-pair (K, K) distances,
point-level matches are aggregated into the (M_ref, M_src) node-overlap
matrix with one-hot matmuls over blocked point tiles — no dynamic shapes,
identical overlap values.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussreg_tpu.ops.pairwise import masked_pairwise_sq_dist, pairwise_sq_dist
from gaussreg_tpu.ops.procrustes import weighted_procrustes
from gaussreg_tpu.ops.transforms import apply_transform

_BIG = 1e12


def _topk_flat_desc(flat: jnp.ndarray, k: int):
    """Descending top-k of a flat NON-NEGATIVE f32 array as ONE unstable
    2-operand sort. `lax.top_k` lowers to a full STABLE sort carrying a
    hidden iota (3 arrays); at the 4.19M LGR verification-set width that
    stability costs ~30% for tie-order nobody depends on (ties here are
    either masked zeros past the valid set or equal-score correspondences
    whose order is immaterial — reference keeps ALL correspondences,
    local_global_registration.py:137-194, so the cap itself is already our
    approximation). Non-negative floats sort by their bit patterns;
    complementing gives a descending key that round-trips exactly."""
    bits = jax.lax.bitcast_convert_type(flat, jnp.uint32)
    key = ~bits
    iota = jnp.arange(flat.shape[0], dtype=jnp.int32)
    key_s, idx_s = jax.lax.sort((key, iota), num_keys=1, is_stable=False)
    vals = jax.lax.bitcast_convert_type(~key_s[:k], jnp.float32)
    return vals, idx_s[:k]


def _rowwise_kth_largest(scores: jnp.ndarray, k: int):
    """k-th largest per row of (R, W) scores, W a lane multiple: the
    mutual-top-k threshold. On TPU uses the select_min_k VPU kernel
    (O(k*W) min-extraction); `lax.top_k` lowers to a full per-row sort —
    ~4.19M elements per call at LGR shapes (round-4 trace, sort.12)."""
    if jax.default_backend() == "tpu" and scores.shape[-1] % 128 == 0:
        from gaussreg_tpu.ops.select_k import select_min_k

        vals, _ = select_min_k(-scores, k)
        return -vals[:, k - 1]
    return jax.lax.top_k(scores, k)[0][:, k - 1]


def superpoint_matching(
    ref_feats: jnp.ndarray,
    src_feats: jnp.ndarray,
    ref_mask: jnp.ndarray,
    src_mask: jnp.ndarray,
    num_correspondences: int,
    dual_normalization: bool = True,
):
    """Global top-k superpoint correspondence proposal
    (reference superpoint_matching.py:13-50). Features must be L2-normalized.

    Returns (ref_indices (P,), src_indices (P,), scores (P,), valid (P,)).
    """
    pair_valid = ref_mask[:, None] & src_mask[None, :]
    scores = jnp.exp(-pairwise_sq_dist(ref_feats, src_feats, normalized=True))
    scores = jnp.where(pair_valid, scores, 0.0)
    if dual_normalization:
        ref_norm = scores / jnp.maximum(jnp.sum(scores, axis=1, keepdims=True), 1e-12)
        src_norm = scores / jnp.maximum(jnp.sum(scores, axis=0, keepdims=True), 1e-12)
        scores = ref_norm * src_norm
    scores = jnp.where(pair_valid, scores, -1.0)
    flat = scores.reshape(-1)
    corr_scores, corr_indices = jax.lax.top_k(flat, num_correspondences)
    ref_idx = (corr_indices // src_feats.shape[0]).astype(jnp.int32)
    src_idx = (corr_indices % src_feats.shape[0]).astype(jnp.int32)
    valid = corr_scores > 0.0
    return ref_idx, src_idx, corr_scores, valid


def node_overlap_matrix(
    ref_points_f: jnp.ndarray,
    src_points_f: jnp.ndarray,
    ref_point_mask: jnp.ndarray,
    src_point_mask: jnp.ndarray,
    ref_point_to_node: jnp.ndarray,
    src_point_to_node: jnp.ndarray,
    ref_in_patch: jnp.ndarray,
    src_in_patch: jnp.ndarray,
    ref_patch_sizes: jnp.ndarray,
    src_patch_sizes: jnp.ndarray,
    num_ref_nodes: int,
    num_src_nodes: int,
    transform: jnp.ndarray,
    pos_radius: float,
    block: int = 2048,
) -> jnp.ndarray:
    """GT (M_ref, M_src) patch-overlap matrix.

    overlap(A, B) = 0.5 * (|{i in patch A : exists j in patch B,
    d(i, T j) < r}| / |A| + symmetric) — exactly the reference's definition
    (matching.py:299-307) computed densely via one-hot matmuls.

    `*_in_patch` flags points that made it into their node's K-nearest patch;
    `*_patch_sizes` are the per-node patch point counts.
    """
    src_t = apply_transform(src_points_f, transform)
    r2 = pos_radius * pos_radius

    ref_w = (ref_point_mask & ref_in_patch).astype(jnp.float32)
    src_w = (src_point_mask & src_in_patch).astype(jnp.float32)
    ref_onehot = (
        jax.nn.one_hot(ref_point_to_node, num_ref_nodes, dtype=jnp.float32)
        * ref_w[:, None]
    )  # (Nf, Mr)
    src_onehot = (
        jax.nn.one_hot(src_point_to_node, num_src_nodes, dtype=jnp.float32)
        * src_w[:, None]
    )  # (Nf, Ms)

    n_ref = ref_points_f.shape[0]
    pad = (-n_ref) % block
    ref_pts_p = jnp.pad(ref_points_f, ((0, pad), (0, 0)))
    ref_oh_p = jnp.pad(ref_onehot, ((0, pad), (0, 0)))
    ref_w_p = jnp.pad(ref_w, (0, pad))

    def body(args):
        pts_blk, oh_blk, w_blk = args  # (B,3), (B,Mr), (B,)
        d2 = pairwise_sq_dist(pts_blk, src_t)  # (B, Ns)
        match = (d2 < r2).astype(jnp.float32) * w_blk[:, None] * src_w[None, :]
        # ref point i matched in src patch B?
        cnt_per_srcnode = match @ src_onehot  # (B, Ms)
        any_ref = (cnt_per_srcnode > 0).astype(jnp.float32)
        ref_cnt = oh_blk.T @ any_ref  # (Mr, Ms): #ref pts of A matched in B
        # src point j matched in ref patch A?
        any_src = ((match.T @ oh_blk) > 0).astype(jnp.float32)  # (Ns, Mr)
        return ref_cnt, any_src

    blocks = (
        ref_pts_p.reshape(-1, block, 3),
        ref_oh_p.reshape(-1, block, num_ref_nodes),
        ref_w_p.reshape(-1, block),
    )
    ref_cnts, any_srcs = jax.lax.map(body, blocks)
    ref_cnt = jnp.sum(ref_cnts, axis=0)  # (Mr, Ms)
    any_src = jnp.max(any_srcs, axis=0)  # (Ns, Mr): matched in A in ANY block
    src_cnt = any_src.T @ src_onehot  # (Mr, Ms): #src pts of B matched in A

    ref_sizes = jnp.maximum(ref_patch_sizes.astype(jnp.float32), 1.0)
    src_sizes = jnp.maximum(src_patch_sizes.astype(jnp.float32), 1.0)
    overlaps = 0.5 * (
        ref_cnt / ref_sizes[:, None] + src_cnt / src_sizes[None, :]
    )
    return overlaps


def sample_gt_node_correspondences(
    key: jax.Array,
    overlaps: jnp.ndarray,
    node_valid: jnp.ndarray,
    num_targets: int,
    overlap_threshold: float,
):
    """Randomly pick `num_targets` node pairs with overlap > threshold
    (reference superpoint_target.py:12-46) without dynamic shapes, via
    Gumbel top-k over the masked flattened overlap matrix.

    Returns (ref_idx (T,), src_idx (T,), overlaps (T,), valid (T,))."""
    ms = overlaps.shape[1]
    eligible = (overlaps > overlap_threshold) & node_valid
    # fallback: if nothing passes the threshold, use the single best pair
    # (reference superpoint_target.py:28-31)
    best = jnp.argmax(jnp.where(node_valid, overlaps, -1.0))
    any_eligible = jnp.any(eligible)
    eligible = jnp.where(
        any_eligible,
        eligible,
        jnp.zeros_like(eligible).reshape(-1).at[best].set(True).reshape(eligible.shape),
    )
    gumbel = jax.random.gumbel(key, overlaps.shape)
    scores = jnp.where(eligible, gumbel, -_BIG)
    top_scores, flat_idx = jax.lax.top_k(scores.reshape(-1), num_targets)
    valid = top_scores > -_BIG / 2
    ref_idx = (flat_idx // ms).astype(jnp.int32)
    src_idx = (flat_idx % ms).astype(jnp.int32)
    sel_overlaps = overlaps.reshape(-1)[flat_idx]
    return ref_idx, src_idx, sel_overlaps, valid


def point_matching_topk(
    ref_knn_points,
    src_knn_points,
    ref_knn_masks,
    src_knn_masks,
    matching_scores,
    k: int = 3,
    mutual: bool = True,
    confidence_threshold: float = 0.05,
    max_correspondences: int = 2048,
):
    """Pose-free top-k (mutual) point matching inside patch pairs
    (reference geotransformer/modules/geotransformer/point_matching.py:5-115):
    same selection as LGR's correspondence extraction, returning the padded
    correspondence set without estimating a transform.

    Returns (ref_points (C, 3), src_points (C, 3), scores (C,), valid (C,)).
    """
    scores = jnp.exp(matching_scores)
    p, kk, _ = scores.shape
    mask_mat = ref_knn_masks[:, :, None] & src_knn_masks[:, None, :]
    ref_sel = scores >= _rowwise_kth_largest(
        scores.reshape(p * kk, kk), k
    ).reshape(p, kk, 1)
    src_sel = scores >= _rowwise_kth_largest(
        scores.swapaxes(1, 2).reshape(p * kk, kk), k
    ).reshape(p, 1, kk)
    sel = (ref_sel & src_sel) if mutual else (ref_sel | src_sel)
    corr = sel & (scores > confidence_threshold) & mask_mat
    masked = jnp.where(corr, scores, 0.0)
    top_scores, top_idx = _topk_flat_desc(
        masked.reshape(-1), max_correspondences
    )
    valid = top_scores > 0.0
    pi = top_idx // (kk * kk)
    ri = (top_idx // kk) % kk
    si = top_idx % kk
    return (
        ref_knn_points[pi, ri],
        src_knn_points[pi, si],
        jnp.where(valid, top_scores, 0.0),
        valid,
    )


def dense_to_node_correspondences(
    ref_points,
    src_points,
    ref_nodes,
    src_nodes,
    corr_ref_idx,
    corr_src_idx,
    corr_valid,
    point_masks,
):
    """Aggregate dense point correspondences into a node-pair count matrix
    with overlap-proxy scores (reference matching.py:176-227 — the dynamic
    unique() becomes a dense (M, M) count matrix).

    Returns (counts (Mr, Ms), scores (Mr, Ms))."""
    ref_point_mask, src_point_mask = point_masks
    mr = ref_nodes.shape[0]
    ms = src_nodes.shape[0]
    ref_p2n = jnp.argmin(
        masked_pairwise_sq_dist(ref_points, ref_nodes, ref_point_mask, None), axis=1
    )
    src_p2n = jnp.argmin(
        masked_pairwise_sq_dist(src_points, src_nodes, src_point_mask, None), axis=1
    )
    ref_sizes = jnp.maximum(
        jax.nn.one_hot(ref_p2n, mr, dtype=jnp.float32).T @ ref_point_mask.astype(jnp.float32),
        1.0,
    )
    src_sizes = jnp.maximum(
        jax.nn.one_hot(src_p2n, ms, dtype=jnp.float32).T @ src_point_mask.astype(jnp.float32),
        1.0,
    )
    pair_ids = ref_p2n[corr_ref_idx] * ms + src_p2n[corr_src_idx]
    counts = (
        jnp.zeros(mr * ms, jnp.float32)
        .at[pair_ids]
        .add(corr_valid.astype(jnp.float32))
        .reshape(mr, ms)
    )
    scores = 0.5 * (counts / ref_sizes[:, None] + counts / src_sizes[None, :])
    return counts, scores


def patch_overlap_ratios(
    ref_knn_points, src_knn_points, ref_knn_masks, src_knn_masks, transform, radius
):
    """Per-patch-pair overlap ratios for batched (P, K, 3) patch pairs
    (reference matching.py:360-430 overlap/occlusion ratio helpers).

    Returns (ref_overlap (P,), src_overlap (P,))."""
    src_t = apply_transform(src_knn_points, transform)
    d2 = pairwise_sq_dist(ref_knn_points, src_t)
    mask = ref_knn_masks[:, :, None] & src_knn_masks[:, None, :]
    close = (d2 < radius * radius) & mask
    ref_matched = jnp.any(close, axis=2)
    src_matched = jnp.any(close, axis=1)
    ref_ratio = jnp.sum(ref_matched, axis=1) / jnp.maximum(
        jnp.sum(ref_knn_masks, axis=1), 1
    )
    src_ratio = jnp.sum(src_matched, axis=1) / jnp.maximum(
        jnp.sum(src_knn_masks, axis=1), 1
    )
    return ref_ratio, src_ratio


class LGRResult(NamedTuple):
    ref_corr_points: jnp.ndarray  # (C, 3)
    src_corr_points: jnp.ndarray  # (C, 3)
    corr_scores: jnp.ndarray  # (C,)
    corr_valid: jnp.ndarray  # (C,)
    transform: jnp.ndarray  # (4, 4)
    num_correspondences: jnp.ndarray  # () int32 — pre-cap count (overflow log)


def local_to_global_registration(
    ref_knn_points: jnp.ndarray,  # (P, K, 3)
    src_knn_points: jnp.ndarray,  # (P, K, 3)
    ref_knn_masks: jnp.ndarray,  # (P, K)
    src_knn_masks: jnp.ndarray,  # (P, K)
    matching_scores: jnp.ndarray,  # (P, K, K) log-domain (dustbin stripped)
    patch_valid: jnp.ndarray,  # (P,)
    k: int = 3,
    acceptance_radius: float = 0.1,
    mutual: bool = True,
    confidence_threshold: float = 0.05,
    correspondence_threshold: int = 3,
    num_refinement_steps: int = 5,
    max_correspondences: int = 2048,
    max_patch_correspondences: int = 128,
) -> LGRResult:
    """Local-to-global registration (reference
    local_global_registration.py:49-235), static shapes:

    1. mutual top-k + confidence threshold -> per-patch correspondence matrix
    2. verification set = globally best `max_correspondences` correspondences
       (the reference keeps all; overflow is counted in
       `num_correspondences`)
    3. one weighted-Procrustes hypothesis per patch (top
       `max_patch_correspondences` in-patch correspondences)
    4. best-hypothesis selection by inlier count + iterative re-weighted
       refinement on the verification set
    """
    p, kk, _ = matching_scores.shape
    scores = jnp.exp(matching_scores)

    mask_mat = ref_knn_masks[:, :, None] & src_knn_masks[:, None, :]

    # top-k per row (ref side): entries that are within the row's top-k —
    # thresholds via the select_min_k kernel on TPU (_rowwise_kth_largest)
    ref_sel = scores >= _rowwise_kth_largest(
        scores.reshape(p * kk, kk), k
    ).reshape(p, kk, 1)
    src_sel = scores >= _rowwise_kth_largest(
        scores.swapaxes(1, 2).reshape(p * kk, kk), k
    ).reshape(p, 1, kk)
    sel = (ref_sel & src_sel) if mutual else (ref_sel | src_sel)
    corr_mat = sel & (scores > confidence_threshold) & mask_mat
    corr_mat = corr_mat & patch_valid[:, None, None]

    masked_scores = jnp.where(corr_mat, scores, 0.0)  # (P, K, K)
    num_corr_total = jnp.sum(corr_mat).astype(jnp.int32)

    # verification set: global top-C by score
    flat_scores = masked_scores.reshape(-1)
    top_scores, top_idx = _topk_flat_desc(flat_scores, max_correspondences)
    corr_valid = top_scores > 0.0
    pi = top_idx // (kk * kk)
    ri = (top_idx // kk) % kk
    si = top_idx % kk
    ref_corr_points = ref_knn_points[pi, ri]  # (C, 3)
    src_corr_points = src_knn_points[pi, si]
    corr_scores = jnp.where(corr_valid, top_scores, 0.0)

    # per-patch hypotheses: top in-patch correspondences
    patch_flat = masked_scores.reshape(p, kk * kk)
    pk = min(max_patch_correspondences, kk * kk)
    patch_scores, patch_idx = jax.lax.top_k(patch_flat, pk)  # (P, pk)
    pri = patch_idx // kk
    psi = patch_idx % kk
    batch_ref = jnp.take_along_axis(ref_knn_points, pri[..., None], axis=1)  # (P,pk,3)
    batch_src = jnp.take_along_axis(src_knn_points, psi[..., None], axis=1)
    batch_w = jnp.maximum(patch_scores, 0.0)
    hyp = weighted_procrustes(batch_src, batch_ref, batch_w)  # (P, 4, 4)

    # hypothesis scoring on the verification set
    r2 = acceptance_radius * acceptance_radius
    aligned = apply_transform(src_corr_points[None], hyp)  # (P, C, 3)
    resid2 = jnp.sum((ref_corr_points[None] - aligned) ** 2, axis=-1)
    inlier = (resid2 < r2) & corr_valid[None, :]
    # patches with too few correspondences are invalid hypotheses
    # (reference local_global_registration.py:161-163)
    patch_corr_counts = jnp.sum(corr_mat, axis=(1, 2))
    hyp_valid = patch_corr_counts >= correspondence_threshold
    inlier_counts = jnp.where(hyp_valid, jnp.sum(inlier, axis=1), -1)
    best = jnp.argmax(inlier_counts)

    cur_scores = corr_scores * inlier[best].astype(corr_scores.dtype)

    def refine(carry, _):
        cur_scores = carry
        t = weighted_procrustes(src_corr_points, ref_corr_points, cur_scores)
        aligned = apply_transform(src_corr_points, t)
        res2 = jnp.sum((ref_corr_points - aligned) ** 2, axis=-1)
        new_scores = corr_scores * ((res2 < r2) & corr_valid).astype(corr_scores.dtype)
        return new_scores, t

    cur, transforms = jax.lax.scan(
        refine, cur_scores, None, length=num_refinement_steps
    )
    transform = transforms[-1]

    return LGRResult(
        ref_corr_points=ref_corr_points,
        src_corr_points=src_corr_points,
        corr_scores=corr_scores,
        corr_valid=corr_valid,
        transform=transform,
        num_correspondences=num_corr_total,
    )
