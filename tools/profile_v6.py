#!/usr/bin/env python
"""v5/v6 culled-rasterizer stage attribution (VERDICT r3 #1).

Measures the bench steady state: probe 1 (sat_depth + bwd demand), probe 2
(live/pair caps under the 6-level pooled stack), then slope-times each stage
WITH the culled caps, against the unculled baseline.
"""

import os
import sys
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tools.profile_raster as _pr

_pr.STAGE_FILTER = sys.argv[1:]
timed_slope = _pr.timed_slope
make_scene = _pr.make_scene

import jax
import jax.numpy as jnp

from gaussreg_tpu.gs.rasterizer import kernels
from gaussreg_tpu.gs.rasterizer.binning import bin_gaussians
from gaussreg_tpu.gs.rasterizer.project import project_gaussians
from gaussreg_tpu.gs.rasterizer.render import render


def main():
    means, scales, quats, opac, sh, cam = make_scene()
    width, height = cam.width, cam.height
    n = means.shape[0]
    tile_h, tile_w, mt = 32, 32, 16
    hp = ((height + tile_h - 1) // tile_h) * tile_h
    wp = ((width + tile_w - 1) // tile_w) * tile_w

    # --- bench probe chain
    probe = render(means, scales, quats, opac, sh, cam, use_pallas=True,
                   max_tiles_per_gaussian=mt)
    bwd_cap = int(int(probe.sat_blocks) * 1.15) + 64
    sat_depth = probe.sat_depth
    p2 = render(means, scales, quats, opac, sh, cam, use_pallas=True,
                max_tiles_per_gaussian=mt, sat_depth=sat_depth)
    live_cap = -(-int(int(p2.num_live) * 1.10) // 256) * 256
    pair_cap = (int(int(p2.num_pairs) * 1.15) + 127) // 128 + 8
    print(
        f"probe: pairs={int(probe.num_pairs)} sat_blocks={int(probe.sat_blocks)}"
        f"\np2 (6-level stack): num_live={int(p2.num_live)}"
        f" culled pairs={int(p2.num_pairs)}"
        f"\ncaps: bwd={bwd_cap} blocks, live={live_cap}, pair={pair_cap} blocks"
        f" (uncapped pair blocks={n * mt // kernels.CHUNK})"
    )

    proj = jax.jit(lambda m: project_gaussians(m, scales, quats, opac, sh, cam))(means)

    # --- binning: unculled vs culled+compacted
    def bin_base(i):
        b = bin_gaussians(proj.means2d + 1e-6 * i, proj.radii, proj.depths,
                          wp, hp, tile_w=tile_w, tile_h=tile_h,
                          max_tiles_per_gaussian=mt, chunk=kernels.CHUNK,
                          extents=proj.extents, minor=proj.minor)
        return (b.sorted_gid[::4096].sum() + b.starts[-1]).astype(jnp.float32)
    timed_slope("binning unculled", bin_base)

    def bin_culled(i, sd):
        b = bin_gaussians(proj.means2d + 1e-6 * i, proj.radii, proj.depths,
                          wp, hp, tile_w=tile_w, tile_h=tile_h,
                          max_tiles_per_gaussian=mt, chunk=kernels.CHUNK,
                          extents=proj.extents, minor=proj.minor,
                          sat_depth=sd, live_cap=live_cap,
                          pair_capacity_blocks=pair_cap)
        return (b.sorted_gid[::4096].sum() + b.starts[-1]).astype(jnp.float32)
    timed_slope("binning culled+compacted", bin_culled, big_args=(sat_depth,))

    # --- pair-block build at culled vs uncapped capacity
    binning_c = jax.jit(functools.partial(
        bin_gaussians, width=wp, height=hp, tile_w=tile_w, tile_h=tile_h,
        max_tiles_per_gaussian=mt, chunk=kernels.CHUNK, live_cap=live_cap,
        pair_capacity_blocks=pair_cap))(
        proj.means2d, proj.radii, proj.depths, extents=proj.extents,
        minor=proj.minor, sat_depth=sat_depth)
    binning_u = jax.jit(functools.partial(
        bin_gaussians, width=wp, height=hp, tile_w=tile_w, tile_h=tile_h,
        max_tiles_per_gaussian=mt, chunk=kernels.CHUNK))(
        proj.means2d, proj.radii, proj.depths, extents=proj.extents,
        minor=proj.minor)
    print(f"  culled overflow_cap={int(binning_c.overflow_cap)}"
          f" live_overflow={int(binning_c.live_overflow)}"
          f" num_pairs={int(binning_c.num_pairs)}")

    def make_gdata(i):
        coeffs = kernels.quadratic_coeffs(
            proj.means2d + 1e-6 * i, proj.conics, proj.opacities)
        z2 = jnp.zeros((n, 2), jnp.float32)
        gdata = jnp.concatenate(
            [coeffs, z2, proj.colors, proj.depths[:, None], z2, z2], axis=1)
        sent = jnp.zeros((1, kernels.NCHAN), jnp.float32).at[0, 0].set(-1e30)
        return jnp.concatenate([gdata, sent], axis=0)

    def gather_c(i, sg):
        blocks = kernels._build_pair_blocks(make_gdata(i), sg)
        return blocks[:, 0, :].sum()
    timed_slope("pair build culled cap", gather_c,
                big_args=(binning_c.sorted_gid,))
    timed_slope("pair build uncapped", gather_c,
                big_args=(binning_u.sorted_gid,))

    # --- pallas kernels over the culled layout
    gdata0 = jax.jit(make_gdata)(0)
    pair_blocks = jax.jit(kernels._build_pair_blocks)(
        gdata0, binning_c.sorted_gid)

    def pallas_fwd(i, pb):
        out, kend = kernels._rasterize_fwd_impl(
            pb + 1e-9 * i, binning_c.starts, hp, wp, tile_h, tile_w)
        return out.sum() + kend.sum()
    timed_slope("pallas fwd (culled layout)", pallas_fwd,
                big_args=(pair_blocks,))

    # --- full culled fwd+bwd (the bench configuration)
    def loss(m, s, q, o, c, sd):
        out = render(m, s, q, o, c, cam, use_pallas=True,
                     max_tiles_per_gaussian=mt, bwd_capacity_blocks=bwd_cap,
                     sat_depth=sd, live_gaussian_cap=live_cap,
                     pair_capacity_blocks=pair_cap)
        return out.rgb.sum() + out.transmittance.sum()

    def full_bwd(i, sd):
        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            means + 1e-6 * i, scales, quats, opac, sh, sd)
        return sum(jnp.sum(x) for x in g)
    per = timed_slope("FULL culled fwd+bwd (bench config)", full_bwd,
                      big_args=(sat_depth,))
    if per:
        print(f"  => {width * height / per / 1e6:.2f} Mrays/s")

    def full_bwd_nocull(i):
        def loss2(m, s, q, o, c):
            out = render(m, s, q, o, c, cam, use_pallas=True,
                         max_tiles_per_gaussian=mt,
                         bwd_capacity_blocks=bwd_cap)
            return out.rgb.sum() + out.transmittance.sum()
        g = jax.grad(loss2, argnums=(0, 1, 2, 3, 4))(
            means + 1e-6 * i, scales, quats, opac, sh)
        return sum(jnp.sum(x) for x in g)
    per = timed_slope("full fwd+bwd NO cull (tight bwd)", full_bwd_nocull)
    if per:
        print(f"  => {width * height / per / 1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
