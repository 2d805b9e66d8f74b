#!/usr/bin/env python
"""Micro-benchmark XLA gather layouts for rasterizer pair materialization.

Slope timing (see tools/profile_raster.py): R reps inside one jit, slope
between two rep counts cancels tunnel RTT and caching."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

G = 100_001
CAP = 1_048_576  # 1M pairs (tighter than round-1's 1.64M)
C = 16


def timed_slope(name, fn, big, r_lo=2, r_hi=8, n_meas=3):
    def looped(k, big, R):
        def body(i, acc):
            return acc + fn(i + k, *big)
        return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

    f = jax.jit(looped, static_argnames="R")
    float(f(0, big, R=r_lo)); float(f(0, big, R=r_hi))

    def meas(R):
        ts = []
        for k in range(n_meas):
            t0 = time.time()
            float(f(k, big, R=R))
            ts.append(time.time() - t0)
        return min(ts)

    per = (meas(r_hi) - meas(r_lo)) / (r_hi - r_lo)
    print(f"{name:50s} {per * 1e3:8.2f} ms/rep")
    return per


def main():
    rng = np.random.default_rng(0)
    pids = jnp.asarray(rng.integers(0, G, size=CAP), jnp.int32)
    gdata128 = jnp.asarray(rng.standard_normal((G, 128)), jnp.float32)
    gdata16 = gdata128[:, :C]
    gdataT = jnp.asarray(np.ascontiguousarray(gdata16.T))  # (16, G)

    sel = [s for s in sys.argv[1:]] or None
    def want(n):
        return sel is None or any(s in n for s in sel)

    # 0. copy baselines
    if want("copy"):
        big = jnp.zeros((CAP, 128), jnp.float32)
        timed_slope("copy 512MB (cap,128)", lambda i, x: (x + jnp.float32(i)).sum(), (big,))
        bigcm = jnp.zeros((C, CAP), jnp.float32)
        timed_slope("copy 64MB (16,cap)", lambda i, x: (x + jnp.float32(i)).sum(), (bigcm,))

    # A. current: row gather (cap, 128)
    if want("A"):
        def f(i, gd, ids):
            rows = gd[(ids + i) % G]
            return rows[:, 0].sum()
        timed_slope("A row-gather (G,128)->(cap,128)", f, (gdata128, pids))

    # B. 16-chan row gather then transpose to (16, cap)
    if want("B"):
        def f(i, gd, ids):
            rows = gd[(ids + i) % G]  # (cap, 16)
            cm = rows.T  # (16, cap)
            return cm[0].sum()
        timed_slope("B row-gather (G,16)->T->(16,cap)", f, (gdata16, pids))

    # C. lane gather: take along axis 1 of (16, G)
    if want("C"):
        def f(i, gdT, ids):
            cm = jnp.take(gdT, (ids + i) % G, axis=1)  # (16, cap)
            return cm[0].sum()
        timed_slope("C lane-gather (16,G)->(16,cap)", f, (gdataT, pids))

    # D. row gather to (cap,16) -> reshape (cap/128,128,16) -> transpose -> (cap/128,16,128)
    if want("D"):
        def f(i, gd, ids):
            rows = gd[(ids + i) % G]  # (cap, 16)
            blocks = rows.reshape(CAP // 128, 128, C).transpose(0, 2, 1)
            return blocks[:, 0, :].sum()
        timed_slope("D row-gather->3D blocks (cap/128,16,128)", f, (gdata16, pids))

    # E. backward-style: gather (G, mt) positions from (16, cap) grads, sum slots
    if want("E"):
        mt = 16
        pos = jnp.asarray(rng.integers(0, CAP, size=(G - 1, mt)), jnp.int32)
        grads_cm = jnp.zeros((C, CAP), jnp.float32)
        def f(i, gr, p):
            picked = jnp.take(gr, (p.reshape(-1) + i) % CAP, axis=1)  # (16, G*mt)
            d = picked.reshape(C, G - 1, mt).sum(axis=2)  # (16, G)
            return d[0].sum()
        timed_slope("E bwd lane-gather (16,cap)->(16,G*16)+sum", f, (grads_cm, pos))

    # E2: backward row-style on (cap,16)
    if want("E2"):
        mt = 16
        pos = jnp.asarray(rng.integers(0, CAP, size=(G - 1, mt)), jnp.int32)
        grads_rows = jnp.zeros((CAP, C), jnp.float32)
        def f(i, gr, p):
            picked = gr[(p + i) % CAP]  # (G, mt, 16)
            return picked.sum(axis=1)[:, 0].sum()
        timed_slope("E2 bwd row-gather (cap,16)->(G,mt,16)+sum", f, (grads_rows, pos))


if __name__ == "__main__":
    main()
