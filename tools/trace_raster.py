#!/usr/bin/env python
"""Device trace of one culled render fwd+bwd (bench config) aggregated
op-by-op — finds the glue/tail time the stage slopes can't separate."""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import tools.profile_raster as _pr
from gaussreg_tpu.gs.rasterizer.render import render


def main():
    means, scales, quats, opac, sh, cam = _pr.make_scene()
    probe = render(means, scales, quats, opac, sh, cam, use_pallas=True,
                   max_tiles_per_gaussian=16)
    bwd_cap = int(int(probe.sat_blocks) * 1.15) + 64
    sat_depth = probe.sat_depth
    p2 = render(means, scales, quats, opac, sh, cam, use_pallas=True,
                max_tiles_per_gaussian=16, sat_depth=sat_depth)
    live_cap = -(-int(int(p2.num_live) * 1.10) // 256) * 256
    pair_cap = (int(int(p2.num_pairs) * 1.15) + 127) // 128 + 8

    def loss(m, s, q, o, c, sd):
        out = render(m, s, q, o, c, cam, use_pallas=True,
                     max_tiles_per_gaussian=16, bwd_capacity_blocks=bwd_cap,
                     sat_depth=sd, live_gaussian_cap=live_cap,
                     pair_capacity_blocks=pair_cap)
        return out.rgb.sum() + out.transmittance.sum()

    @jax.jit
    def step(i, m, s, q, o, c, sd):
        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(m + 1e-6 * i, s, q, o, c, sd)
        return sum(jnp.sum(x) for x in g)

    float(step(jnp.float32(0), means, scales, quats, opac, sh, sat_depth))
    tdir = "/tmp/jtrace_raster"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        float(step(jnp.float32(1), means, scales, quats, opac, sh, sat_depth))
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    agg = collections.Counter()
    cat = collections.Counter()
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        pid_dev = None
        for ev in data["traceEvents"]:
            if ev.get("ph") == "M" and ev.get("name") == "process_name" \
               and "TPU" in (ev.get("args") or {}).get("name", ""):
                pid_dev = ev["pid"]
        for ev in data["traceEvents"]:
            if ev.get("ph") != "X" or ev.get("pid") != pid_dev:
                continue
            name = ev["name"]
            if name.startswith("jit_"):
                continue
            dur = ev["dur"] / 1e3
            agg[name] += dur
            cat[(ev.get("args") or {}).get("hlo_category", "?")] += dur
    print("== by hlo_category ==")
    for k, v in cat.most_common(15):
        print(f"{v:8.3f} ms  {k}")
    print("== top ops ==")
    for k, v in agg.most_common(30):
        print(f"{v:8.3f} ms  {k}")
    # long names for the top few
    tops = {k for k, _ in agg.most_common(12)}
    seen = set()
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data["traceEvents"]:
            n = ev.get("name")
            if ev.get("ph") == "X" and n in tops and n not in seen:
                seen.add(n)
                ln = (ev.get("args") or {}).get("long_name", "")[:220]
                print(f"\n{n}: {ln}")


if __name__ == "__main__":
    main()
