#!/usr/bin/env python
"""Quantify the saturation-culling opportunity on the bench scene
(VERDICT r2 #4): per-tile saturation depth from the forward's kend, then
 - what fraction of gaussians are entirely behind saturation (cullable)
 - what fraction of (gaussian, tile) pairs survive
 - per-gaussian bbox tile counts (mt sizing)
All analysis on host numpy from device arrays; render runs on the chip.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tools.profile_raster import make_scene
from gaussreg_tpu.gs.rasterizer import kernels
from gaussreg_tpu.gs.rasterizer.binning import bin_gaussians
from gaussreg_tpu.gs.rasterizer.project import project_gaussians


def main():
    means, scales, quats, opac, sh, cam = make_scene()
    tile_h, tile_w, mt = 16, 32, 16
    hp = ((cam.height + tile_h - 1) // tile_h) * tile_h
    wp = ((cam.width + tile_w - 1) // tile_w) * tile_w
    ntx, nty = wp // tile_w, hp // tile_h
    chunk = kernels.CHUNK

    proj = jax.jit(
        lambda m: project_gaussians(m, scales, quats, opac, sh, cam)
    )(means)
    binning = bin_gaussians(
        proj.means2d, proj.radii, proj.depths, wp, hp, tile_w=tile_w,
        tile_h=tile_h, max_tiles_per_gaussian=mt, chunk=chunk,
        extents=proj.extents, minor=proj.minor,
    )

    coeffs = kernels.quadratic_coeffs(proj.means2d, proj.conics, proj.opacities)
    g = means.shape[0]
    z2 = jnp.zeros((g, 2), jnp.float32)
    gdata = jnp.concatenate(
        [coeffs, z2, proj.colors, proj.depths[:, None], z2, z2], axis=1)
    sent = jnp.zeros((1, kernels.NCHAN), jnp.float32).at[0, 0].set(-1e30)
    gdata = jnp.concatenate([gdata, sent], axis=0)
    pair_blocks = jax.jit(kernels._build_pair_blocks)(gdata, binning.sorted_gid)
    out, kend = kernels._rasterize_fwd_impl(
        pair_blocks, binning.starts, hp, wp, tile_h, tile_w)

    starts = np.asarray(binning.starts)
    kend = np.asarray(kend)
    sorted_gid = np.asarray(binning.sorted_gid)
    depths = np.asarray(proj.depths)
    num_tiles = ntx * nty
    cap = sorted_gid.shape[0]

    # per-tile saturation depth: depth of the last composited element when
    # the kernel exited early (saturated); +inf when it consumed all pairs
    c0 = starts[:-1]
    c1 = starts[1:]
    start_blk = c0 // chunk
    n_el = c1 - c0
    num_chunks = np.where(n_el > 0, (c1 - 1) // chunk - start_blk + 1, 0)
    saturated = kend < num_chunks
    e_last = np.clip(np.minimum((start_blk + kend) * chunk, c1) - 1, 0, cap - 1)
    gid_last = sorted_gid[e_last]
    d_last = np.where(
        gid_last < g, depths[np.minimum(gid_last, g - 1)], np.inf)
    sat_depth = np.where(saturated, d_last, np.inf)
    print(f"tiles={num_tiles} saturated={int(saturated.sum())} "
          f"sat_blocks={int(kend.sum())}/{cap // chunk} "
          f"num_pairs={int(starts[-1])}")

    # exact per-pair keep test (reproduce binning's slot enumeration on host)
    mx, my = np.asarray(proj.means2d).T
    hx, hy = np.asarray(proj.extents).T
    r = np.asarray(proj.radii)
    alive = r > 0
    x0 = np.clip(np.floor((mx - hx) / tile_w).astype(int), 0, ntx - 1)
    x1 = np.clip(np.floor((mx + hx) / tile_w).astype(int), 0, ntx - 1)
    y0 = np.clip(np.floor((my - hy) / tile_h).astype(int), 0, nty - 1)
    y1 = np.clip(np.floor((my + hy) / tile_h).astype(int), 0, nty - 1)
    bw = np.where(alive, x1 - x0 + 1, 0)
    bh = np.where(alive, y1 - y0 + 1, 0)
    count = bw * bh
    for m in (4, 6, 8, 12, 16):
        print(f"  mt={m}: overflow pairs={int(np.maximum(count - m, 0).sum())} "
              f"gaussians hit={int((count > m).sum())}")

    sat_img = sat_depth.reshape(nty, ntx)
    live = np.zeros(g, bool)
    kept_pairs = 0
    total_pairs = 0
    margin = 1.02
    slot = np.arange(mt)
    bw_s = np.maximum(bw, 1)
    for gi_chunk in range(0, g, 20000):
        sl = slice(gi_chunk, min(gi_chunk + 20000, g))
        dy = slot[None, :] // bw_s[sl, None]
        dx = slot[None, :] % bw_s[sl, None]
        in_bbox = slot[None, :] < np.minimum(count[sl], mt)[:, None]
        tx = x0[sl, None] + dx
        ty = y0[sl, None] + dy
        sd = sat_img[np.clip(ty, 0, nty - 1), np.clip(tx, 0, ntx - 1)]
        keep = in_bbox & (depths[sl, None] <= sd * margin)
        live[sl] = keep.any(1)
        kept_pairs += int(keep.sum())
        total_pairs += int(in_bbox.sum())
    print(f"live gaussians: {int(live.sum())}/{int(alive.sum())} alive "
          f"({g} total) = {live.sum() / max(alive.sum(), 1):.3f} of alive")
    print(f"kept pairs (before circle/slab cull): {kept_pairs}/{total_pairs} "
          f"= {kept_pairs / total_pairs:.3f}")
    # pairs among LIVE gaussians only (gaussian-level compaction keeps all
    # slots of a live gaussian)
    live_pairs = int(np.minimum(count, mt)[live].sum())
    print(f"pairs from live gaussians: {live_pairs}/{total_pairs} "
          f"= {live_pairs / total_pairs:.3f}")


if __name__ == "__main__":
    main()
