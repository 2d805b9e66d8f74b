"""KPConv-FPN backbone: 5-stage encoder + 3-level decoder.

reference: experiments/geotransformer.gaussian_splatting.indoor/backbone.py:95-212.
Operates on a Pyramid with a leading cloud axis (2 for a [ref, src] pair).
Returns (feats_f, feats_c): level-1 decoder features (dim `output_dim`) and
level-4 encoder features (dim init_dim * 32).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from gaussreg_tpu.data.pipeline import Pyramid
from gaussreg_tpu.models.kpconv import (
    ConvBlock,
    ResidualBlock as _ResidualBlock,
    UnaryBlock,
    generate_kernel_points,
    kpconv_geometry,
    nearest_upsample,
)

# rematerialize each residual block: KPConv's (B, M, H, C) neighbor-feature
# intermediates dominate training memory; recomputing them in backward
# (cheap now that gathers are Morton-local) keeps the full-capacity train
# step within HBM
ResidualBlock = nn.remat(_ResidualBlock)


class KPConvFPN(nn.Module):
    input_dim: int
    output_dim: int
    init_dim: int
    kernel_size: int
    init_radius: float
    init_sigma: float
    group_norm: int
    shared_geometry: bool = True

    @nn.compact
    def __call__(self, feats: jnp.ndarray, pyramid: Pyramid):
        d, k, r, s, g = (
            self.init_dim,
            self.kernel_size,
            self.init_radius,
            self.init_sigma,
            self.group_norm,
        )
        pts, msk = pyramid.points, pyramid.masks
        nbr, sub, up = pyramid.neighbors, pyramid.subsampling, pyramid.upsampling

        # Shared feature-independent KPConv geometry (influence + counts),
        # computed once per neighbor list instead of once per conv: every
        # conv of a stage uses the same deterministic kernel disposition, so
        # the point gather + influence chain (~60% of a KPConv forward,
        # tools/profile_backbone.py) is stage-level common subexpression.
        if self.shared_geometry:
            from gaussreg_tpu.models.kpconv import generate_kernel_points_lloyd

            gen = generate_kernel_points_lloyd if k > 30 else generate_kernel_points
            kp0 = jnp.asarray(gen(k))
            geo_n = [
                kpconv_geometry(
                    pts[l], pts[l], nbr[l], kp0 * (r * 2**l), s * 2**l
                )
                for l in range(5)
            ]
            geo_s = [
                kpconv_geometry(
                    pts[l + 1], pts[l], sub[l], kp0 * (r * 2**l), s * 2**l
                )
                for l in range(4)
            ]
        else:
            geo_n, geo_s = [None] * 5, [None] * 4

        # Encoder stage 1 (level 0)
        x1 = ConvBlock(self.input_dim, d, k, r, s, g)(
            feats, pts[0], pts[0], nbr[0], msk[0], geo_n[0]
        )
        x1 = ResidualBlock(d, d * 2, k, r, s, g)(
            x1, pts[0], pts[0], nbr[0], msk[0], msk[0], geo_n[0]
        )

        # Stage 2 (level 0 -> 1)
        x2 = ResidualBlock(d * 2, d * 2, k, r, s, g, strided=True)(
            x1, pts[1], pts[0], sub[0], msk[1], msk[0], geo_s[0]
        )
        x2 = ResidualBlock(d * 2, d * 4, k, r * 2, s * 2, g)(
            x2, pts[1], pts[1], nbr[1], msk[1], msk[1], geo_n[1]
        )
        x2 = ResidualBlock(d * 4, d * 4, k, r * 2, s * 2, g)(
            x2, pts[1], pts[1], nbr[1], msk[1], msk[1], geo_n[1]
        )

        # Stage 3 (level 1 -> 2)
        x3 = ResidualBlock(d * 4, d * 4, k, r * 2, s * 2, g, strided=True)(
            x2, pts[2], pts[1], sub[1], msk[2], msk[1], geo_s[1]
        )
        x3 = ResidualBlock(d * 4, d * 8, k, r * 4, s * 4, g)(
            x3, pts[2], pts[2], nbr[2], msk[2], msk[2], geo_n[2]
        )
        x3 = ResidualBlock(d * 8, d * 8, k, r * 4, s * 4, g)(
            x3, pts[2], pts[2], nbr[2], msk[2], msk[2], geo_n[2]
        )

        # Stage 4 (level 2 -> 3)
        x4 = ResidualBlock(d * 8, d * 8, k, r * 4, s * 4, g, strided=True)(
            x3, pts[3], pts[2], sub[2], msk[3], msk[2], geo_s[2]
        )
        x4 = ResidualBlock(d * 8, d * 16, k, r * 8, s * 8, g)(
            x4, pts[3], pts[3], nbr[3], msk[3], msk[3], geo_n[3]
        )
        x4 = ResidualBlock(d * 16, d * 16, k, r * 8, s * 8, g)(
            x4, pts[3], pts[3], nbr[3], msk[3], msk[3], geo_n[3]
        )

        # Stage 5 (level 3 -> 4)
        x5 = ResidualBlock(d * 16, d * 16, k, r * 8, s * 8, g, strided=True)(
            x4, pts[4], pts[3], sub[3], msk[4], msk[3], geo_s[3]
        )
        x5 = ResidualBlock(d * 16, d * 32, k, r * 16, s * 16, g)(
            x5, pts[4], pts[4], nbr[4], msk[4], msk[4], geo_n[4]
        )
        x5 = ResidualBlock(d * 32, d * 32, k, r * 16, s * 16, g)(
            x5, pts[4], pts[4], nbr[4], msk[4], msk[4], geo_n[4]
        )

        # Decoder (reference backbone.py:192-210): level 4 feats are the
        # coarse output; upsample+concat+unary down to level 1
        l4 = nearest_upsample(x5, up[3])
        l4 = jnp.concatenate([l4, x4], axis=-1)
        l4 = UnaryBlock(d * 16, g)(l4, msk[3])

        l3 = nearest_upsample(l4, up[2])
        l3 = jnp.concatenate([l3, x3], axis=-1)
        l3 = UnaryBlock(d * 8, g)(l3, msk[2])

        l2 = nearest_upsample(l3, up[1])
        l2 = jnp.concatenate([l2, x2], axis=-1)
        l2 = nn.Dense(self.output_dim)(l2)  # LastUnaryBlock (modules.py:86-101)

        feats_f = l2  # (B, N1, output_dim)
        feats_c = x5  # (B, N4, init_dim * 32)
        return feats_f, feats_c
