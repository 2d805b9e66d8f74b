"""Geometric Transformer: pairwise-distance + triplet-angle structure
embedding feeding an RPE conditional transformer.

reference: geotransformer/modules/geotransformer/geotransformer.py:9-155.
The angular embedding is computed in row chunks so the (N, N, k, hidden)
intermediate never materializes at full size (the reference materializes it,
which is fine at GPU-research scale but wasteful under padding).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gaussreg_tpu.models.transformer import (
    RPEConditionalTransformer,
    sinusoidal_embedding,
)
from gaussreg_tpu.ops.pairwise import masked_pairwise_sq_dist

_BIG = 1e12


class GeometricStructureEmbedding(nn.Module):
    """reference geotransformer.py:9-72."""

    hidden_dim: int
    sigma_d: float
    sigma_a: float
    angle_k: int
    reduction_a: str = "max"
    row_chunk: int = 64

    @nn.compact
    def __call__(self, points, mask):
        # points: (B, N, 3), mask: (B, N)
        b, n, _ = points.shape
        k = self.angle_k
        factor_a = 180.0 / (self.sigma_a * np.pi)

        sq = masked_pairwise_sq_dist(points, points, mask, mask)  # (B, N, N)
        dist = jnp.sqrt(jnp.minimum(sq, _BIG))
        d_indices = jnp.where(sq < _BIG / 2, dist, 0.0) / self.sigma_d

        # k nearest *other* points per row (reference geotransformer.py:42)
        self_mask = jnp.eye(n, dtype=bool)[None]
        sq_knn = jnp.where(self_mask, _BIG, sq)
        _, knn_indices = jax.lax.top_k(-sq_knn, k)  # (B, N, k)
        knn_points = jnp.take_along_axis(
            points[:, None, :, :].repeat(n, axis=1),
            knn_indices[..., None].repeat(3, axis=-1),
            axis=2,
        )  # (B, N, k, 3)
        ref_vectors = knn_points - points[:, :, None, :]  # (B, N, k, 3)

        proj_d = nn.Dense(self.hidden_dim, name="proj_d")
        # proj_a params must be created outside lax.map (flax init inside a
        # scan leaks tracers), so keep them as raw params
        h = self.hidden_dim
        a_kernel = self.param(
            "proj_a_kernel", nn.initializers.lecun_normal(), (h, h)
        )
        a_bias = self.param("proj_a_bias", nn.initializers.zeros, (h,))

        d_emb = proj_d(sinusoidal_embedding(d_indices, self.hidden_dim))

        # angular embedding, chunked over query rows to bound the
        # (rows, N, k, hidden) intermediate; anc_vectors[b, i, j] = p_j - p_i
        def angle_chunk(pts_chunk, refv_chunk):
            # pts_chunk: (B, C, 3), refv_chunk: (B, C, k, 3)
            anc = points[:, None, :, :] - pts_chunk[:, :, None, :]  # (B, C, N, 3)
            cross = jnp.cross(
                refv_chunk[:, :, None, :, :], anc[:, :, :, None, :]
            )  # (B, C, N, k, 3)
            sin = jnp.linalg.norm(cross, axis=-1)
            cos = jnp.einsum("bckt,bcnt->bcnk", refv_chunk, anc)
            angles = jnp.arctan2(sin, cos)  # (B, C, N, k)
            a_emb = (
                sinusoidal_embedding(angles * factor_a, self.hidden_dim) @ a_kernel
                + a_bias
            )
            if self.reduction_a == "max":
                return jnp.max(a_emb, axis=3)  # (B, C, N, H)
            return jnp.mean(a_emb, axis=3)

        chunk = min(self.row_chunk, n)
        pad = (-n) % chunk
        pts_p = jnp.pad(points, ((0, 0), (0, pad), (0, 0)))
        refv_p = jnp.pad(ref_vectors, ((0, 0), (0, pad), (0, 0), (0, 0)))
        num_chunks = (n + pad) // chunk
        pts_c = pts_p.reshape(b, num_chunks, chunk, 3).swapaxes(0, 1)
        refv_c = refv_p.reshape(b, num_chunks, chunk, k, 3).swapaxes(0, 1)
        a_emb = jax.lax.map(lambda t: angle_chunk(*t), (pts_c, refv_c))
        a_emb = a_emb.swapaxes(0, 1).reshape(b, n + pad, n, self.hidden_dim)[:, :n]

        return d_emb + a_emb


class GeometricTransformer(nn.Module):
    """reference geotransformer.py:75-155."""

    input_dim: int
    output_dim: int
    hidden_dim: int
    num_heads: int
    blocks: tuple
    sigma_d: float
    sigma_a: float
    angle_k: int
    reduction_a: str = "max"

    @nn.compact
    def __call__(
        self, ref_points, src_points, ref_feats, src_feats, ref_mask, src_mask
    ):
        embed = GeometricStructureEmbedding(
            self.hidden_dim,
            self.sigma_d,
            self.sigma_a,
            self.angle_k,
            self.reduction_a,
            name="embedding",
        )
        ref_embed = embed(ref_points, ref_mask)
        src_embed = embed(src_points, src_mask)

        in_proj = nn.Dense(self.hidden_dim, name="in_proj")
        ref_f = in_proj(ref_feats)
        src_f = in_proj(src_feats)

        ref_f, src_f = RPEConditionalTransformer(
            tuple(self.blocks), self.hidden_dim, self.num_heads, name="transformer"
        )(ref_f, src_f, ref_embed, src_embed, ref_mask, src_mask)

        out_proj = nn.Dense(self.output_dim, name="out_proj")
        return out_proj(ref_f), out_proj(src_f)
