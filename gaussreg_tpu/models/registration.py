"""The GaussReg coarse registration model (GeoTransformer-style) in flax.

reference: experiments/geotransformer.gaussian_splatting.indoor/model.py:19-222.
One forward = backbone over the [ref, src] pair batch, geometric transformer
over superpoints, superpoint matching, Sinkhorn OT over patch-local features,
LGR, and an on-device similarity RANSAC (replacing the reference's host
Open3D RANSAC at model.py:209-215). Fully jittable, static shapes.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from gaussreg_tpu.config import Config
from gaussreg_tpu.data.pipeline import PairBatch
from gaussreg_tpu.models.backbone import KPConvFPN
from gaussreg_tpu.models.geotransformer import GeometricTransformer
from gaussreg_tpu.models.kpconv import batched_gather
from gaussreg_tpu.models.matching import (
    local_to_global_registration,
    node_overlap_matrix,
    sample_gt_node_correspondences,
    superpoint_matching,
)
from gaussreg_tpu.ops.partition import point_to_node_partition
from gaussreg_tpu.ops.ransac import ransac_similarity
from gaussreg_tpu.ops.sinkhorn import log_optimal_transport


def _patch_membership(node_knn_indices, node_knn_masks, num_points):
    """(N+1,) flag: point is inside some node's K-nearest patch."""
    flat_idx = node_knn_indices.reshape(-1)
    flat_ok = node_knn_masks.reshape(-1)
    member = jnp.zeros(num_points + 1, dtype=bool)
    member = member.at[flat_idx].max(flat_ok)
    return member[:num_points]


class GaussRegModel(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(
        self,
        batch: PairBatch,
        train: bool = False,
        with_transform: bool = True,
        with_gt_overlaps: bool = False,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        pyr = batch.pyramid
        out: Dict[str, Any] = {}

        points_f = pyr.points[1]  # (2, Nf, 3)
        masks_f = pyr.masks[1]
        points_c = pyr.points[-1]  # (2, Nc, 3)
        masks_c = pyr.masks[-1]
        nf = points_f.shape[1]

        # 1. point-to-node partition per cloud (reference model.py:99-109)
        (
            p2n,
            node_masks,
            node_knn_indices,
            node_knn_masks,
            node_sizes,
        ) = jax.vmap(
            lambda pts, nds, pm, nm: point_to_node_partition(
                pts, nds, pm, nm, cfg.model.num_points_in_patch
            )
        )(points_f, points_c, masks_f, masks_c)

        node_knn_points = batched_gather(points_f, node_knn_indices, fill=0.0)

        # 2. KPConv-FPN backbone
        feats_f, feats_c = KPConvFPN(
            cfg.backbone.input_dim,
            cfg.backbone.output_dim,
            cfg.backbone.init_dim,
            cfg.backbone.kernel_size,
            cfg.backbone.init_radius,
            cfg.backbone.init_sigma,
            cfg.backbone.group_norm,
            cfg.backbone.shared_kpconv_geometry,
            name="backbone",
        )(batch.features, pyr)

        # 3. geometric transformer over superpoints (reference model.py:134-144)
        ref_feats_c, src_feats_c = GeometricTransformer(
            cfg.geotransformer.input_dim,
            cfg.geotransformer.output_dim,
            cfg.geotransformer.hidden_dim,
            cfg.geotransformer.num_heads,
            cfg.geotransformer.blocks,
            cfg.geotransformer.sigma_d,
            cfg.geotransformer.sigma_a,
            cfg.geotransformer.angle_k,
            cfg.geotransformer.reduction_a,
            name="transformer",
        )(
            points_c[0:1],
            points_c[1:2],
            feats_c[0:1],
            feats_c[1:2],
            masks_c[0:1],
            masks_c[1:2],
        )
        ref_feats_c = ref_feats_c[0]
        src_feats_c = src_feats_c[0]
        # rsqrt(sum^2 + eps), NOT x / max(norm, eps): linalg.norm's VJP is
        # x/||x|| = NaN at exactly-zero rows (masked nodes stay identically
        # zero through the transformer), and 0 * NaN poisons the whole grad
        ref_feats_c_norm = ref_feats_c * jax.lax.rsqrt(
            jnp.sum(ref_feats_c**2, axis=-1, keepdims=True) + 1e-12
        )
        src_feats_c_norm = src_feats_c * jax.lax.rsqrt(
            jnp.sum(src_feats_c**2, axis=-1, keepdims=True) + 1e-12
        )
        out["ref_feats_c"] = ref_feats_c_norm
        out["src_feats_c"] = src_feats_c_norm
        out["ref_node_masks"] = node_masks[0]
        out["src_node_masks"] = node_masks[1]

        # 4. GT node overlaps (training, or eval-time coarse-precision
        # diagnostics; reference model.py:111-126)
        if train or with_gt_overlaps:
            overlaps = node_overlap_matrix(
                points_f[0],
                points_f[1],
                masks_f[0],
                masks_f[1],
                p2n[0],
                p2n[1],
                _patch_membership(node_knn_indices[0], node_knn_masks[0], nf),
                _patch_membership(node_knn_indices[1], node_knn_masks[1], nf),
                jnp.sum(node_knn_masks[0], axis=-1),
                jnp.sum(node_knn_masks[1], axis=-1),
                points_c.shape[1],
                points_c.shape[1],
                batch.transform,
                cfg.model.ground_truth_matching_radius,
            )
            node_pair_valid = node_masks[0][:, None] & node_masks[1][None, :]
            overlaps = jnp.where(node_pair_valid, overlaps, 0.0)
            out["gt_node_overlaps"] = overlaps

        # 5. superpoint matching proposals (no grad; reference model.py:156-162)
        sg = jax.lax.stop_gradient
        ref_idx_prop, src_idx_prop, prop_scores, prop_valid = superpoint_matching(
            sg(ref_feats_c_norm),
            sg(src_feats_c_norm),
            node_masks[0],
            node_masks[1],
            cfg.coarse_matching.num_correspondences,
            cfg.coarse_matching.dual_normalization,
        )
        out["ref_node_corr_indices"] = ref_idx_prop
        out["src_node_corr_indices"] = src_idx_prop
        out["node_corr_valid"] = prop_valid

        # 6. training overrides proposals with sampled GT pairs
        # (reference model.py:164-168)
        if train:
            key = self.make_rng("sample")
            ref_idx, src_idx, sel_overlaps, sel_valid = sample_gt_node_correspondences(
                key,
                overlaps,
                node_pair_valid,
                cfg.coarse_matching.num_targets,
                cfg.coarse_matching.overlap_threshold,
            )
        else:
            ref_idx, src_idx, sel_valid = ref_idx_prop, src_idx_prop, prop_valid
        node_corr_scores = prop_scores

        # 7. gather patch points/feats for selected node pairs
        # (reference model.py:170-186)
        ref_knn_pts = node_knn_points[0][ref_idx]  # (P, K, 3)
        src_knn_pts = node_knn_points[1][src_idx]
        ref_knn_msk = node_knn_masks[0][ref_idx] & sel_valid[:, None]
        src_knn_msk = node_knn_masks[1][src_idx] & sel_valid[:, None]
        ref_knn_feats = batched_gather(
            feats_f[0:1], node_knn_indices[0][ref_idx][None], fill=0.0
        )[0]  # (P, K, C)
        src_knn_feats = batched_gather(
            feats_f[1:2], node_knn_indices[1][src_idx][None], fill=0.0
        )[0]
        out["ref_node_corr_knn_points"] = ref_knn_pts
        out["src_node_corr_knn_points"] = src_knn_pts
        out["ref_node_corr_knn_masks"] = ref_knn_msk
        out["src_node_corr_knn_masks"] = src_knn_msk

        # 8. optimal transport (reference model.py:188-193)
        c = feats_f.shape[-1]
        matching_scores = jnp.einsum("pkc,plc->pkl", ref_knn_feats, src_knn_feats)
        matching_scores = matching_scores / jnp.sqrt(jnp.asarray(c, jnp.float32))
        alpha = self.param("ot_alpha", nn.initializers.ones, ())
        matching_scores = log_optimal_transport(
            matching_scores,
            ref_knn_msk,
            src_knn_msk,
            alpha,
            cfg.model.num_sinkhorn_iterations,
        )  # (P, K+1, K+1)
        out["matching_scores"] = matching_scores

        # 9. fine matching + on-device RANSAC (no grad; reference
        # model.py:195-220)
        if with_transform:
            scores_nodustbin = sg(matching_scores)[:, :-1, :-1]
            lgr = local_to_global_registration(
                sg(ref_knn_pts),
                sg(src_knn_pts),
                ref_knn_msk,
                src_knn_msk,
                scores_nodustbin,
                sel_valid,
                k=cfg.fine_matching.topk,
                acceptance_radius=cfg.fine_matching.acceptance_radius,
                mutual=cfg.fine_matching.mutual,
                confidence_threshold=cfg.fine_matching.confidence_threshold,
                correspondence_threshold=cfg.fine_matching.correspondence_threshold,
                num_refinement_steps=cfg.fine_matching.num_refinement_steps,
                max_correspondences=cfg.capacity.max_correspondences,
                max_patch_correspondences=cfg.capacity.max_patch_correspondences,
            )
            out["ref_corr_points"] = lgr.ref_corr_points
            out["src_corr_points"] = lgr.src_corr_points
            out["corr_scores"] = lgr.corr_scores
            out["corr_valid"] = lgr.corr_valid
            out["lgr_transform"] = lgr.transform
            out["num_correspondences"] = lgr.num_correspondences

            ransac_key = self.make_rng("ransac")
            transform, inliers = ransac_similarity(
                ransac_key,
                lgr.src_corr_points,
                lgr.ref_corr_points,
                lgr.corr_valid,
                cfg.ransac.distance_threshold,
                num_iterations=(
                    cfg.ransac.num_iterations_train
                    if train
                    else cfg.ransac.num_iterations_test
                ),
                num_points=(
                    cfg.ransac.num_points_train if train else cfg.ransac.num_points_test
                ),
                with_scale=cfg.ransac.with_scale,
            )
            out["estimated_transform"] = transform
            out["ransac_inliers"] = inliers

        return out


def create_model(cfg: Config) -> GaussRegModel:
    return GaussRegModel(cfg)
