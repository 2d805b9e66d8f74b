#!/usr/bin/env python
"""Rasterizer stage attribution on real TPU through the axon tunnel.

Timing method (see PERF.md): the tunnel adds ~30 ms RTT per call,
block_until_ready is unreliable, and identical requests may be cached.
So each measurement jits a fori_loop running the stage R times with an
iteration-dependent input perturbation, forces host materialization of a
scalar, and reports the slope between two rep counts — per-rep time with
RTT/launch overhead cancelled.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE_FILTER = sys.argv[1:]  # substrings; empty = run all


def _selected(name):
    return not STAGE_FILTER or any(s in name for s in STAGE_FILTER)

import numpy as np
import jax
import jax.numpy as jnp

from gaussreg_tpu.gs.rasterizer.camera import look_at_camera
from gaussreg_tpu.gs.rasterizer.render import render
from gaussreg_tpu.gs.rasterizer.binning import bin_gaussians
from gaussreg_tpu.gs.rasterizer.project import project_gaussians
from gaussreg_tpu.gs.rasterizer import kernels


def make_scene(n=100000, width=640, height=480):
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-1, 1, size=(n, 3)), jnp.float32)
    scales = jnp.asarray(
        np.exp(rng.normal(loc=-3.2, scale=0.4, size=(n, 3))), jnp.float32
    )
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opac = jnp.asarray(1 / (1 + np.exp(-rng.normal(1.0, 1.0, size=n))), jnp.float32)
    sh = np.zeros((n, 3, 16), np.float32)
    sh[:, :, 0] = rng.uniform(-1, 1, size=(n, 3))
    sh[:, :, 1:] = rng.normal(scale=0.05, size=(n, 3, 15))
    sh = jnp.asarray(sh)
    cam = look_at_camera(
        eye=[0, 0, -4.0], target=[0, 0, 0], up=[0, 1, 0],
        fov_deg=60, width=width, height=height,
    )
    return means, scales, quats, opac, sh, cam


def timed_slope(name, scalar_fn, r_lo=2, r_hi=8, n_meas=3, big_args=()):
    """scalar_fn(i, *big_args) -> scalar; jit a loop running it R times.
    Large arrays must go through big_args (closing over them serializes
    them into the remote compile request -> HTTP 413)."""
    if not _selected(name):
        return None

    def looped(R_dummy, big, R):
        def body(i, acc):
            return acc + scalar_fn(i, *big)
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    f = jax.jit(looped, static_argnames="R")
    # compile both variants
    float(f(0, big_args, R=r_lo)); float(f(0, big_args, R=r_hi))

    def meas(R):
        ts = []
        for k in range(n_meas):
            t0 = time.time()
            float(f(k, big_args, R=R))
            ts.append(time.time() - t0)
        return min(ts)

    t_lo, t_hi = meas(r_lo), meas(r_hi)
    per = (t_hi - t_lo) / (r_hi - r_lo)
    print(f"{name:45s} {per * 1e3:8.2f} ms/rep   (lo {t_lo*1e3:.0f} hi {t_hi*1e3:.0f})")
    return per


def main():
    means, scales, quats, opac, sh, cam = make_scene()
    width, height = cam.width, cam.height
    n = means.shape[0]
    tile_h, tile_w, mt = 16, 32, 16
    hp = ((height + tile_h - 1) // tile_h) * tile_h
    wp = ((width + tile_w - 1) // tile_w) * tile_w

    def perturb(i):
        return means + 1e-6 * i

    # --- stage: projection fwd
    def proj_fwd(i):
        p = project_gaussians(perturb(i), scales, quats, opac, sh, cam)
        return p.means2d.sum() + p.colors.sum() + p.radii.sum()
    timed_slope("projection fwd", proj_fwd)

    # --- stage: projection fwd+bwd
    def proj_loss(m):
        p = project_gaussians(m, scales, quats, opac, sh, cam)
        return p.means2d.sum() + p.colors.sum() + p.conics.sum()
    def proj_bwd(i):
        return jax.grad(proj_loss)(perturb(i)).sum()
    timed_slope("projection fwd+bwd", proj_bwd)

    # --- precompute a projection for downstream stages
    proj = jax.jit(lambda m: project_gaussians(m, scales, quats, opac, sh, cam))(means)
    proj = jax.tree.map(lambda x: jax.device_put(x), proj)

    # --- stage: binning alone (materialize sorted ids + pos table)
    def bin_only(i):
        b = bin_gaussians(proj.means2d + 1e-6 * i, proj.radii, proj.depths,
                          wp, hp, tile_w=tile_w, tile_h=tile_h,
                          max_tiles_per_gaussian=mt, chunk=kernels.CHUNK)
        return (b.sorted_gid[::4096].sum() + b.starts[-1]).astype(jnp.float32)
    timed_slope("binning (sort-based, materialized)", bin_only)

    binning = jax.jit(functools.partial(
        bin_gaussians, width=wp, height=hp, tile_w=tile_w, tile_h=tile_h,
        max_tiles_per_gaussian=mt, chunk=kernels.CHUNK))(
        proj.means2d, proj.radii, proj.depths)
    print(f"  pairs={int(binning.num_pairs)}"
          f" cap={binning.sorted_gid.shape[0]}"
          f" overflow={int(binning.overflow)}"
          f" overflow_cap={int(binning.overflow_cap)}")

    # --- stage: gdata build + pair gather fwd (materialized blocks)
    def make_gdata(i):
        coeffs = kernels.quadratic_coeffs(
            proj.means2d + 1e-6 * i, proj.conics, proj.opacities)
        z2 = jnp.zeros((n, 2), jnp.float32)
        gdata = jnp.concatenate(
            [coeffs, z2, proj.colors, proj.depths[:, None], z2, z2], axis=1)
        sent = jnp.zeros((1, kernels.NCHAN), jnp.float32).at[0, 0].set(-1e30)
        return jnp.concatenate([gdata, sent], axis=0)

    def gather_fwd(i):
        blocks = kernels._build_pair_blocks(make_gdata(i), binning.sorted_gid)
        return blocks[:, 0, :].sum()
    timed_slope("gdata+pair-block build fwd", gather_fwd)

    # --- stage: pallas kernels on fixed pair blocks
    nblk = binning.sorted_gid.shape[0] // kernels.CHUNK
    ntiles = (wp // tile_w) * (hp // tile_h)
    gdata0 = jax.jit(make_gdata)(0)
    pair_blocks = jax.jit(kernels._build_pair_blocks)(gdata0, binning.sorted_gid)

    def pallas_fwd(i, pb):
        out, kend = kernels._rasterize_fwd_impl(
            pb + 1e-9 * i, binning.starts, hp, wp, tile_h, tile_w)
        return out.sum() + kend.sum()
    timed_slope("pallas fwd kernel", pallas_fwd, big_args=(pair_blocks,))

    # saturation-compacted backward inputs (kernels.py module docstring)
    chunk_n = kernels.CHUNK
    _, kend = kernels._rasterize_fwd_impl(
        pair_blocks, binning.starts, hp, wp, tile_h, tile_w)
    nblk2 = nblk + ntiles
    offs = jnp.minimum(
        jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(kend, dtype=jnp.int32)]
        ),
        nblk2,
    )
    start_blk = binning.starts[:-1] // chunk_n
    marks = jnp.zeros((nblk2 + 1,), jnp.int32).at[offs[1:-1]].add(1)[:nblk2]
    tile_of = jnp.cumsum(marks)
    k_of = jnp.arange(nblk2, dtype=jnp.int32) - offs[tile_of]
    blk_src = jnp.clip(start_blk[tile_of] + k_of, 0, nblk - 1)
    pair_blocks2 = pair_blocks.reshape(nblk, -1)[blk_src].reshape(
        nblk2, kernels.NCHAN, chunk_n)
    print(f"  sat_blocks={int(kend.sum())} of nblk={nblk}")

    # --- stage: backward scatter-add accumulation (gid-keyed; kernels._bwd)
    grows0 = jnp.zeros((nblk2, kernels.NCHAN, chunk_n), jnp.float32)
    cap_el = binning.sorted_gid.shape[0]
    ntile_cnt = binning.starts.shape[0] - 1
    def accum_only(i, gr):
        lane = jnp.arange(chunk_n, dtype=jnp.int32)
        pos_orig = blk_src[:, None] * chunk_n + lane
        live = ((jnp.arange(nblk2, dtype=jnp.int32) < offs[ntile_cnt])[:, None]
                & (pos_orig < cap_el))
        gid = jnp.where(
            live, binning.sorted_gid[jnp.minimum(pos_orig, cap_el - 1)], n)
        grows = (gr + 1e-9 * i).transpose(0, 2, 1).reshape(-1, kernels.NCHAN)
        d = jnp.zeros((n + 1, kernels.NCHAN), jnp.float32).at[
            gid.reshape(-1)].add(grows)
        return d[::7, 0].sum()
    timed_slope("bwd gid scatter-add accumulation", accum_only, big_args=(grows0,))

    ct0 = jnp.ones((7, hp, wp), jnp.float32)
    def pallas_bwd(i, pb):
        grads = kernels._rasterize_bwd_impl(
            pb + 1e-9 * i, binning.starts, offs, blk_src, ct0, nblk2, hp, wp,
            tile_h, tile_w)
        return grads[::17, 0, :].sum()
    timed_slope("pallas bwd kernel alone (compacted)", pallas_bwd,
                big_args=(pair_blocks,))

    # --- full render fwd
    def full_fwd(i):
        out = render(perturb(i), scales, quats, opac, sh, cam,
                     use_pallas=True, max_tiles_per_gaussian=mt)
        return out.rgb.sum() + out.transmittance.sum()
    timed_slope("full render fwd", full_fwd)

    # --- full render fwd+bwd (the bench): two-pass tight backward cap,
    # exactly like bench.py
    probe = render(means, scales, quats, opac, sh, cam, use_pallas=True,
                   max_tiles_per_gaussian=mt)
    bwd_cap = int(int(probe.sat_blocks) * 1.15) + 64
    print(f"  bwd cap: {bwd_cap} blocks (sat {int(probe.sat_blocks)})")

    def full_bwd(i):
        def loss(m, s, q, o, c):
            out = render(m, s, q, o, c, cam, use_pallas=True,
                         max_tiles_per_gaussian=mt,
                         bwd_capacity_blocks=bwd_cap)
            return out.rgb.sum() + out.transmittance.sum()
        gr = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(perturb(i), scales, quats, opac, sh)
        return sum(jnp.sum(x) for x in gr)
    timed_slope("FULL render fwd+bwd (bench, tight cap)", full_bwd)

    # --- saturation-culled steady state (bench.py): probe sat_depth +
    # live-gaussian compaction + tight pair capacity
    p2 = render(means, scales, quats, opac, sh, cam, use_pallas=True,
                max_tiles_per_gaussian=mt, sat_depth=probe.sat_depth)
    live_cap = -(-int(int(p2.num_live) * 1.10) // 256) * 256
    pair_cap = (int(int(p2.num_pairs) * 1.15) + 127) // 128 + 8
    print(f"  cull: live {int(p2.num_live)}/{n} -> live_cap {live_cap}; "
          f"pairs {int(p2.num_pairs)}/{int(binning.num_pairs)} "
          f"-> pair_cap {pair_cap} blocks")

    def culled_bin(i, sd):
        b = bin_gaussians(proj.means2d + 1e-6 * i, proj.radii, proj.depths,
                          wp, hp, tile_w=tile_w, tile_h=tile_h,
                          max_tiles_per_gaussian=mt, chunk=kernels.CHUNK,
                          extents=proj.extents, minor=proj.minor,
                          sat_depth=sd, live_cap=live_cap,
                          pair_capacity_blocks=pair_cap)
        return (b.sorted_gid[::4096].sum() + b.starts[-1]).astype(jnp.float32)
    timed_slope("binning CULLED (compacted sort)", culled_bin,
                big_args=(probe.sat_depth,))

    def full_bwd_culled(i, sd):
        def loss(m, s, q, o, c):
            out = render(m, s, q, o, c, cam, use_pallas=True,
                         max_tiles_per_gaussian=mt,
                         bwd_capacity_blocks=bwd_cap, sat_depth=sd,
                         live_gaussian_cap=live_cap,
                         pair_capacity_blocks=pair_cap)
            return out.rgb.sum() + out.transmittance.sum()
        gr = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(perturb(i), scales, quats, opac, sh)
        return sum(jnp.sum(x) for x in gr)
    timed_slope("FULL render fwd+bwd CULLED (bench v5)", full_bwd_culled,
                big_args=(probe.sat_depth,))


if __name__ == "__main__":
    main()
