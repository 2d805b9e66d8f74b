"""KPConv layers and blocks (flax), batched and mask-native.

TPU-native redesign of the reference KPConv stack
(reference: geotransformer/modules/kpconv/kpconv.py:10-133,
modules.py:33-225, functional.py:6-67, kernel_points.py:389-455):

- all ops take a leading cloud axis (B, N, ...) — the [ref, src] pair is
  processed in one pass like the reference's stacked clouds, but as a batch
  axis instead of a lengths vector;
- the (M, H, K, 3) kernel-difference tensor is never materialized: kernel
  influences come from a |n|^2 - 2 n.kp + |kp|^2 gram expansion (one MXU
  matmul);
- GroupNorm statistics are computed jointly over all valid points of the
  whole batch (matching the reference, which normalizes the stacked ref+src
  cloud as one instance: modules.py:47-50);
- kernel point dispositions are generated deterministically by in-ball
  repulsion (same construction class as kernel_points.py:248-387, no cached
  .ply asset needed).
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_SENTINEL_COORD = 1e6


@functools.lru_cache(maxsize=None)
def generate_kernel_points(num_points: int = 15, seed: int = 42) -> np.ndarray:
    """Deterministic well-spread kernel point dispositions in the unit ball,
    first point fixed at the center (reference 'center' mode,
    kernel_points.py:389-455). Computed by inverse-square repulsion descent."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(num_points, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= rng.uniform(0.3, 1.0, size=(num_points, 1))
    pts[0] = 0.0
    lr = 0.01
    for it in range(2000):
        diff = pts[:, None, :] - pts[None, :, :]
        d = np.linalg.norm(diff, axis=-1) + 1e-9
        np.fill_diagonal(d, np.inf)
        force = np.sum(diff / (d**3)[..., None], axis=1)
        pts += lr * force
        pts[0] = 0.0
        norms = np.linalg.norm(pts[1:], axis=1, keepdims=True)
        pts[1:] = np.where(norms > 1.0, pts[1:] / norms, pts[1:])
        lr *= 0.999
    return pts.astype(np.float32)


@functools.lru_cache(maxsize=None)
def generate_kernel_points_lloyd(
    num_points: int, seed: int = 42, num_samples: int = 20000, iters: int = 60
) -> np.ndarray:
    """Spherical-Lloyd kernel dispositions: centroidal Voronoi tessellation
    of the unit ball (k-means on uniform ball samples), first point fixed at
    the center. The reference switches to this construction for kernels with
    more than 30 points (kernel_points.py:62-245, load_kernels :397-408);
    `generate_kernel_points` (repulsion) covers the 15-point kernels the
    GaussReg experiment uses."""
    rng = np.random.default_rng(seed)
    samples = rng.normal(size=(num_samples, 3))
    samples /= np.linalg.norm(samples, axis=1, keepdims=True)
    samples *= rng.uniform(size=(num_samples, 1)) ** (1.0 / 3.0)
    centers = samples[rng.choice(num_samples, num_points, replace=False)].copy()
    centers[0] = 0.0
    for _ in range(iters):
        d2 = ((samples[:, None, :] - centers[None]) ** 2).sum(-1)
        assign = np.argmin(d2, axis=1)
        for j in range(1, num_points):
            sel = samples[assign == j]
            if sel.shape[0]:
                centers[j] = sel.mean(0)
        centers[0] = 0.0
    return centers.astype(np.float32)


def batched_gather(values: jnp.ndarray, indices: jnp.ndarray, fill=0.0):
    """Gather (B, N, C) at (B, M, K) with sentinel index == N -> fill.

    Lowered as ONE flat row gather with per-batch offsets: measured 4x
    faster on TPU than vmap(take) / take_along_axis for backbone shapes
    (12 ms vs 46 ms at 4.3M rows — PERF.md)."""
    b, n = values.shape[:2]
    flat = values.reshape((b * n,) + values.shape[2:])
    clipped = jnp.minimum(indices, n - 1)
    off = (jnp.arange(b, dtype=indices.dtype) * n).reshape(
        (b,) + (1,) * (indices.ndim - 1)
    )
    out = flat[(clipped + off).reshape(-1)].reshape(
        indices.shape + values.shape[2:]
    )
    sentinel = (indices == n)[..., None]
    return jnp.where(sentinel, jnp.asarray(fill, values.dtype), out)


def kpconv_geometry(q_points, s_points, neighbor_indices, kernel_points, sigma):
    """Feature-independent part of KPConv: the (B, M, H, K) kernel
    influences and per-query neighbor counts.

    Computed ONCE per neighbor list and shared by every conv on that list
    (backbone.py): the point gather + influence chain is ~60% of a KPConv
    forward on TPU (measured 25 of 42 ms at level-0 shapes,
    tools/profile_backbone.py) and is identical across the 2-3 convs of a
    backbone stage. Stored bf16: inputs feed bf16 einsums anyway.
    """
    nbr = batched_gather(s_points, neighbor_indices, fill=_SENTINEL_COORD)
    nbr = nbr - q_points[:, :, None, :]  # (B, M, H, 3)
    # |n - kp|^2 via gram expansion (no (B,M,H,K,3) tensor)
    n2 = jnp.sum(nbr * nbr, axis=-1)[..., None]  # (B, M, H, 1)
    cross = jnp.einsum("bmhc,kc->bmhk", nbr, kernel_points)
    k2 = jnp.sum(kernel_points * kernel_points, axis=-1)  # (K,)
    sq = jnp.maximum(n2 - 2.0 * cross + k2, 0.0)  # (B, M, H, K)
    influence = jnp.maximum(1.0 - jnp.sqrt(sq) / sigma, 0.0)
    count = jnp.sum(neighbor_indices != s_points.shape[1], axis=-1)
    return influence.astype(jnp.bfloat16), count


class KPConv(nn.Module):
    """Kernel point convolution (reference kpconv.py:79-122).

    __call__(s_feats (B,N,Cin), q_points (B,M,3), s_points (B,N,3),
             neighbor_indices (B,M,H), geometry=None) -> (B,M,Cout)

    `geometry` is an optional precomputed (influence, count) pair from
    `kpconv_geometry` (shared across the convs of a backbone stage). When
    given, this layer's own `kernel_points` param is NOT used — only valid
    when all convs on the list share one disposition (true for our
    deterministic generator; reference checkpoints apply a random rotation
    per layer, kernel_points.py:428-453, so the torch-import path must pass
    geometry=None).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float

    @nn.compact
    def __call__(self, s_feats, q_points, s_points, neighbor_indices, geometry=None):
        k = self.kernel_size
        # kernel dispositions live in the param tree (zero-gradient via
        # stop_gradient) so reference torch checkpoints — whose KPConv
        # registers `kernel_points` as a buffer with a random rotation
        # applied at instantiation (reference kernel_points.py:428-453) —
        # can be imported bit-exactly (engine/torch_import.py)
        # repulsion dispositions for small kernels, spherical Lloyd above 30
        # points (reference load_kernels switch, kernel_points.py:396-397)
        gen = generate_kernel_points_lloyd if k > 30 else generate_kernel_points
        kp = self.param(
            "kernel_points",
            lambda _key: jnp.asarray(gen(k) * self.radius),
        )
        kp = jax.lax.stop_gradient(kp)  # (K, 3)
        weights = self.param(
            "weights",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (k, self.in_channels, self.out_channels),
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.out_channels,)
        )  # reference kpconv.py:56,119-120 (bias=True in every block)

        if geometry is None:
            geometry = kpconv_geometry(
                q_points, s_points, neighbor_indices, kp, self.sigma
            )
        influence, count = geometry

        # bf16 inputs + f32 accumulation: these einsums dominate backbone
        # time (batched small matmuls); f32 MXU matmuls cost 3 passes, bf16
        # one. Activation precision loss is negligible for the network.
        # The cast happens BEFORE the neighbor gather: XLA row-gather cost
        # is source-size sensitive (2.2 ns/row under ~13 MB, 6.4 ns above —
        # PERF.md), and level-0/1 f32 feature tables sit just above the
        # knee while their bf16 halves sit under it. The einsum consumes
        # bf16 either way, so this changes cost, not values.
        bf = jnp.bfloat16
        h = neighbor_indices.shape[-1]
        use_fused = (
            jax.default_backend() == "tpu"
            and k <= 16
            and self.in_channels % 64 == 0
            and self.in_channels <= 256
            and self.out_channels % 64 == 0
        )
        if use_fused:
            # fused Pallas aggregation (ops/kpconv_kernel.py): the XLA
            # einsum pair below is a (B*M)-batched tiny matmul that pads
            # K=15 to 128 lanes, spills a ~550 MB scratch and serializes
            # (28 ms of the eval forward at level-0 shapes — round-4/5
            # traces). Neighbor slots are padded to 8 (sentinel gathers
            # return zero features / zero influence, so padding is exact);
            # backward re-derives through the einsum form (custom_vjp), so
            # training numerics are unchanged.
            from gaussreg_tpu.ops.kpconv_kernel import kpconv_fused_apply

            he = ((h + 7) // 8) * 8
            n = s_feats.shape[1]
            idx_p = jnp.pad(
                neighbor_indices, ((0, 0), (0, 0), (0, he - h)),
                constant_values=n,
            )
            nf = batched_gather(s_feats.astype(bf), idx_p, fill=0.0)
            infl_p = jnp.pad(
                influence.astype(bf), ((0, 0), (0, 0), (0, he - h), (0, 0))
            )
            out = kpconv_fused_apply(nf, infl_p, weights)
        else:
            nf = batched_gather(
                s_feats.astype(bf), neighbor_indices, fill=0.0
            )  # (B, M, H, C)
            weighted = jnp.einsum(
                "bmhk,bmhc->bmkc",
                influence.astype(bf),
                nf,
                preferred_element_type=jnp.float32,
            )
            out = jnp.einsum(
                "bmkc,kcd->bmd",
                weighted.astype(bf),
                weights.astype(bf),
                preferred_element_type=jnp.float32,
            )

        # per-query neighbor-count normalization (reference kpconv.py:113-116)
        out = out / jnp.maximum(count, 1)[..., None].astype(out.dtype)
        return out + bias


class MaskedGroupNorm(nn.Module):
    """GroupNorm whose statistics span all valid points of the whole batch
    jointly — the reference normalizes the stacked (ref+src) cloud as a
    single instance (modules.py:47-50, torch GroupNorm over (1, C, N))."""

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask):
        # x: (B, N, C), mask: (B, N)
        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, (c, g)
        m = mask[..., None].astype(x.dtype)
        xg = (x * m).reshape(x.shape[:-1] + (g, c // g))
        denom = jnp.maximum(jnp.sum(m), 1.0) * (c // g)
        mean = jnp.sum(xg, axis=(0, 1, 3)) / denom  # (g,)
        var = (
            jnp.sum(
                jnp.where(mask[..., None, None], (xg - mean[:, None]) ** 2, 0.0),
                axis=(0, 1, 3),
            )
            / denom
        )
        xg = (xg - mean[:, None]) * jax.lax.rsqrt(var[:, None] + self.eps)
        xn = xg.reshape(x.shape)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return (xn * scale + bias) * m


class UnaryBlock(nn.Module):
    """Linear -> GroupNorm -> LeakyReLU(0.1) (reference modules.py:53-83)."""

    out_channels: int
    group_norm: int
    has_relu: bool = True

    @nn.compact
    def __call__(self, x, mask):
        x = nn.Dense(self.out_channels)(x)
        x = MaskedGroupNorm(self.group_norm)(x, mask)
        if self.has_relu:
            x = nn.leaky_relu(x, 0.1)
        return x


class ConvBlock(nn.Module):
    """KPConv -> GroupNorm -> LeakyReLU (reference modules.py:104-146)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    group_norm: int

    @nn.compact
    def __call__(
        self, s_feats, q_points, s_points, neighbor_indices, q_mask, geometry=None
    ):
        x = KPConv(
            self.in_channels, self.out_channels, self.kernel_size, self.radius, self.sigma
        )(s_feats, q_points, s_points, neighbor_indices, geometry)
        x = MaskedGroupNorm(self.group_norm)(x, q_mask)
        return nn.leaky_relu(x, 0.1)


def maxpool(s_feats, neighbor_indices):
    """Max over neighbors, sentinel contributes 0 (reference functional.py:54-67)."""
    nf = batched_gather(s_feats, neighbor_indices, fill=0.0)
    return jnp.max(nf, axis=2)


def nearest_upsample(s_feats, upsample_indices):
    """Take the first (nearest) neighbor's features
    (reference functional.py:6-22)."""
    return batched_gather(s_feats, upsample_indices[:, :, :1], fill=0.0)[:, :, 0]


def knn_interpolate(s_feats, q_points, s_points, neighbor_indices, k: int, eps=1e-8):
    """Inverse-squared-distance weighted interpolation over the first k
    neighbors (reference functional.py:25-51)."""
    idx = neighbor_indices[:, :, :k]
    knn_points = batched_gather(s_points, idx, fill=0.0)  # (B, N, k, 3)
    knn_feats = batched_gather(s_feats, idx, fill=0.0)  # (B, N, k, C)
    sq = jnp.sum((q_points[:, :, None, :] - knn_points) ** 2, axis=-1)
    masks = (idx != s_points.shape[1]).astype(s_feats.dtype)
    weights = masks / (sq + eps)
    weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + eps)
    return jnp.sum(knn_feats * weights[..., None], axis=2)


def global_avgpool(feats, mask):
    """Masked mean over each cloud (reference functional.py:70-90; the
    lengths loop becomes a masked mean over the batch axis)."""
    m = mask[..., None].astype(feats.dtype)
    return jnp.sum(feats * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)


class ResidualBlock(nn.Module):
    """Bottleneck residual KPConv block (reference modules.py:149-225).

    When `strided`, queries live on the next (coarser) level and the shortcut
    is a neighbor max-pool."""

    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    group_norm: int
    strided: bool = False

    @nn.compact
    def __call__(
        self,
        s_feats,
        q_points,
        s_points,
        neighbor_indices,
        q_mask,
        s_mask,
        geometry=None,
    ):
        mid = self.out_channels // 4
        if self.in_channels != mid:
            x = UnaryBlock(mid, self.group_norm)(s_feats, s_mask)
        else:
            x = s_feats
        x = KPConv(mid, mid, self.kernel_size, self.radius, self.sigma)(
            x, q_points, s_points, neighbor_indices, geometry
        )
        x = MaskedGroupNorm(self.group_norm)(x, q_mask)
        x = nn.leaky_relu(x, 0.1)
        x = UnaryBlock(self.out_channels, self.group_norm, has_relu=False)(x, q_mask)

        shortcut = maxpool(s_feats, neighbor_indices) if self.strided else s_feats
        if self.in_channels != self.out_channels:
            shortcut = UnaryBlock(self.out_channels, self.group_norm, has_relu=False)(
                shortcut, q_mask
            )
        return nn.leaky_relu(x + shortcut, 0.1)
