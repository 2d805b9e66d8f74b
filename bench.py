#!/usr/bin/env python
"""Driver benchmark: GS rasterizer forward+backward throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric per BASELINE.json: Mrays/s/chip for a full differentiable
render (forward + analytic backward through the Pallas tile kernels) at
640x480 with a 100k-gaussian scene. `vs_baseline` is value / 100.0 — the
reference CUDA 3DGS rasterizer class of hardware achieves O(100) Mrays/s
fwd+bwd at this resolution (no number is published in the reference repo
itself: BASELINE.md), so 1.0 means CUDA-class parity.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussreg_tpu.gs.rasterizer.camera import look_at_camera
    from gaussreg_tpu.gs.rasterizer.render import render

    n = 100000
    width, height = 640, 480
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

    use_pallas = jax.default_backend() == "tpu"
    chain = 5  # renders per jit call, amortizes dispatch latency

    def loss(m, s, q, o, c):
        acc = 0.0
        for i in range(chain):
            out = render(
                m + 0.0 * i, s, q, o, c, cam,
                use_pallas=use_pallas, max_tiles_per_gaussian=16,
            )
            acc = acc + out.rgb.sum() + out.transmittance.sum()
        return acc

    gfn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    args = (means, scales, quats, opac, sh)
    jax.block_until_ready(gfn(*args))  # compile
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        jax.block_until_ready(gfn(*args))
    dt = (time.time() - t0) / (reps * chain)

    mrays = width * height / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "gs_rasterizer_fwd_bwd",
                "value": round(mrays, 2),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays / 100.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
