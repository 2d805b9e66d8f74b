"""Reference XLA renderer: exact per-pixel alpha compositing over all
gaussians, differentiable via autodiff. O(H*W*G) — correctness oracle for
the Pallas tile kernel and a fallback for tiny scenes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gaussreg_tpu.gs.rasterizer.project import ProjectedGaussians

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99


def composite_pixels(
    px: jnp.ndarray,  # (..., 2) pixel centers
    order: jnp.ndarray,  # (G,) gaussian indices in front-to-back order
    proj: ProjectedGaussians,
):
    """Alpha-composite all gaussians (in `order`) over a block of pixels.
    Returns (rgb (..., 3), transmittance (...,))."""

    means = proj.means2d[order]
    conics = proj.conics[order]
    colors = jnp.concatenate(
        [proj.colors, proj.depths[:, None]], axis=1
    )[order]  # (G, 4): rgb + depth composited alike
    opac = jnp.where(proj.valid[order], proj.opacities[order], 0.0)

    def body(carry, inputs):
        rgb, t = carry
        mean, conic, color, op = inputs
        d = px - mean  # (..., 2)
        power = -0.5 * (
            conic[0] * d[..., 0] ** 2
            + conic[2] * d[..., 1] ** 2
        ) - conic[1] * d[..., 0] * d[..., 1]
        alpha = op * jnp.exp(jnp.minimum(power, 0.0))
        alpha = jnp.where(alpha < ALPHA_MIN, 0.0, jnp.minimum(alpha, ALPHA_MAX))
        rgb = rgb + (t * alpha)[..., None] * color
        t = t * (1.0 - alpha)
        return (rgb, t), None

    rgb0 = jnp.zeros(px.shape[:-1] + (4,), jnp.float32)
    t0 = jnp.ones(px.shape[:-1], jnp.float32)
    (rgbd, t), _ = jax.lax.scan(body, (rgb0, t0), (means, conics, colors, opac))
    return rgbd, t


@functools.partial(jax.jit, static_argnames=("width", "height", "row_block"))
def render_reference(
    proj: ProjectedGaussians, width: int, height: int, row_block: int = 16
):
    """Full-image reference render. Returns (rgb (H, W, 3), depth (H, W),
    T (H, W))."""
    order = jnp.argsort(jnp.where(proj.valid, proj.depths, jnp.inf))

    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5

    def render_rows(y_batch):
        px = jnp.stack(
            jnp.meshgrid(y_batch, xs, indexing="ij")[::-1], axis=-1
        )  # (rows, W, 2) with (x, y) channel order
        return composite_pixels(px, order, proj)

    rows = ys.reshape(-1, row_block)
    rgbd, t = jax.lax.map(render_rows, rows)
    rgbd = rgbd.reshape(height, width, 4)
    return rgbd[..., :3], rgbd[..., 3], t.reshape(height, width)
