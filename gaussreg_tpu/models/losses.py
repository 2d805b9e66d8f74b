"""Losses: weighted circle loss (coarse) + OT negative log-likelihood (fine).

reference: geotransformer/modules/loss/circle_loss.py:44-132 and
experiments/geotransformer.gaussian_splatting.indoor/loss.py:10-92.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from gaussreg_tpu.config import Config
from gaussreg_tpu.ops.pairwise import pairwise_sq_dist
from gaussreg_tpu.ops.transforms import apply_transform

_BIG = 1e5


def weighted_circle_loss(
    pos_masks,
    neg_masks,
    feat_dists,
    pos_margin,
    neg_margin,
    pos_optimal,
    neg_optimal,
    log_scale,
    pos_scales=None,
):
    """reference circle_loss.py:44-86 (masked-mean instead of boolean
    indexing for static shapes)."""
    row_masks = jnp.any(pos_masks, axis=-1) & jnp.any(neg_masks, axis=-1)
    col_masks = jnp.any(pos_masks, axis=-2) & jnp.any(neg_masks, axis=-2)

    pos_weights = feat_dists - _BIG * (~pos_masks)
    pos_weights = jnp.maximum(pos_weights - pos_optimal, 0.0)
    if pos_scales is not None:
        pos_weights = pos_weights * pos_scales
    pos_weights = jax.lax.stop_gradient(pos_weights)

    neg_weights = feat_dists + _BIG * (~neg_masks)
    neg_weights = jnp.maximum(neg_optimal - neg_weights, 0.0)
    neg_weights = jax.lax.stop_gradient(neg_weights)

    loss_pos_row = jax.nn.logsumexp(
        log_scale * (feat_dists - pos_margin) * pos_weights, axis=-1
    )
    loss_pos_col = jax.nn.logsumexp(
        log_scale * (feat_dists - pos_margin) * pos_weights, axis=-2
    )
    loss_neg_row = jax.nn.logsumexp(
        log_scale * (neg_margin - feat_dists) * neg_weights, axis=-1
    )
    loss_neg_col = jax.nn.logsumexp(
        log_scale * (neg_margin - feat_dists) * neg_weights, axis=-2
    )

    loss_row = jax.nn.softplus(loss_pos_row + loss_neg_row) / log_scale
    loss_col = jax.nn.softplus(loss_pos_col + loss_neg_col) / log_scale

    def masked_mean(x, m):
        return jnp.sum(jnp.where(m, x, 0.0)) / jnp.maximum(jnp.sum(m), 1)

    return (masked_mean(loss_row, row_masks) + masked_mean(loss_col, col_masks)) / 2.0


def coarse_matching_loss(cfg: Config, output: Dict) -> jnp.ndarray:
    """reference loss.py:10-40: circle loss on coarse feature distances with
    overlap-scaled positives."""
    ref_feats = output["ref_feats_c"]
    src_feats = output["src_feats_c"]
    overlaps = output["gt_node_overlaps"]  # (Mr, Ms) with invalid pairs 0
    valid = output["ref_node_masks"][:, None] & output["src_node_masks"][None, :]

    # eps floor: sqrt'(0) = inf, and identical feature rows would NaN the
    # gradient even where the (stop-gradient) circle-loss weights are zero
    feat_dists = jnp.sqrt(
        jnp.maximum(pairwise_sq_dist(ref_feats, src_feats, normalized=True), 1e-12)
    )
    pos_masks = (overlaps > cfg.coarse_loss.positive_overlap) & valid
    neg_masks = (overlaps == 0.0) & valid
    pos_scales = jnp.sqrt(jnp.where(pos_masks, overlaps, 0.0))

    return weighted_circle_loss(
        pos_masks,
        neg_masks,
        feat_dists,
        cfg.coarse_loss.positive_margin,
        cfg.coarse_loss.negative_margin,
        cfg.coarse_loss.positive_optimal,
        cfg.coarse_loss.negative_optimal,
        cfg.coarse_loss.log_scale,
        pos_scales,
    )


def fine_matching_loss(cfg: Config, output: Dict, transform) -> jnp.ndarray:
    """reference loss.py:43-71: mean NLL of GT correspondence entries (plus
    slack row/col labels) under the Sinkhorn log transport plan."""
    ref_pts = output["ref_node_corr_knn_points"]  # (P, K, 3)
    src_pts = output["src_node_corr_knn_points"]
    ref_msk = output["ref_node_corr_knn_masks"]  # (P, K)
    src_msk = output["src_node_corr_knn_masks"]
    scores = output["matching_scores"]  # (P, K+1, K+1)

    src_t = apply_transform(src_pts, transform)
    d2 = pairwise_sq_dist(ref_pts, src_t)  # (P, K, K)
    gt_masks = ref_msk[:, :, None] & src_msk[:, None, :]
    gt_corr = (d2 < cfg.loss.fine_positive_radius**2) & gt_masks
    slack_row = (jnp.sum(gt_corr, axis=2) == 0) & ref_msk  # (P, K)
    slack_col = (jnp.sum(gt_corr, axis=1) == 0) & src_msk

    p, k, _ = gt_corr.shape
    labels = jnp.zeros((p, k + 1, k + 1), dtype=bool)
    labels = labels.at[:, :k, :k].set(gt_corr)
    labels = labels.at[:, :k, k].set(slack_row)
    labels = labels.at[:, k, :k].set(slack_col)

    total = jnp.sum(jnp.where(labels, scores, 0.0))
    count = jnp.maximum(jnp.sum(labels), 1)
    return -total / count


def overall_loss(cfg: Config, output: Dict, transform) -> Dict[str, jnp.ndarray]:
    """reference loss.py:74-92."""
    c_loss = coarse_matching_loss(cfg, output)
    f_loss = fine_matching_loss(cfg, output, transform)
    loss = cfg.loss.weight_coarse_loss * c_loss + cfg.loss.weight_fine_loss * f_loss
    return {"loss": loss, "c_loss": c_loss, "f_loss": f_loss}
