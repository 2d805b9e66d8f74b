#!/usr/bin/env python
"""Device trace of one full-capacity build_pyramid call, aggregated
op-by-op (same parsing as trace_raster.py) — locates where the ~456 ms
per-pair pyramid cost (tools/probe_pairstages.py, PERF.md round 4) goes."""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gaussreg_tpu.config import make_cfg
from gaussreg_tpu.data.synthetic import random_pair
from gaussreg_tpu.data.pipeline import build_pyramid


def main():
    cfg = make_cfg()
    rp, rf, sp, sf, m = random_pair(cfg, 0, num_points=cfg.train.point_limit)
    cap0 = cfg.capacity.levels[0]
    pts0 = np.zeros((2, cap0, 3), np.float32)
    pts0[0, : rp.shape[0]] = rp
    pts0[1, : sp.shape[0]] = sp
    msk0 = np.zeros((2, cap0), bool)
    msk0[0, : rp.shape[0]] = True
    msk0[1, : sp.shape[0]] = True
    points = jnp.asarray(pts0)
    mask = jnp.asarray(msk0)

    @jax.jit
    def step(i):
        pyr = build_pyramid(
            points + 1e-6 * i, mask,
            cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
            cfg.capacity.levels, cfg.capacity.neighbor_limits,
            cfg.backbone.num_stages, window_rows0=cfg.capacity.window_rows0,
        )
        acc = jnp.float32(0)
        for t in (pyr.neighbors + pyr.subsampling + pyr.upsampling):
            acc += jnp.sum(t.astype(jnp.float32))
        for p in pyr.points:
            acc += jnp.sum(p)
        return acc + pyr.search_overflow

    float(step(jnp.float32(0)))
    tdir = "/tmp/jtrace_pyr"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        float(step(jnp.float32(1)))
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
    tops = {k for k, _ in agg.most_common(14)}
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
