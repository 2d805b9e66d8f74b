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

    def loss(m, s, q, o, c):
        out = render(
            m, s, q, o, c, cam, use_pallas=use_pallas, max_tiles_per_gaussian=16
        )
        return out.rgb.sum() + out.transmittance.sum()

    def gsum(*a):
        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*a)
        return sum(jnp.sum(x) for x in g)

    gfn = jax.jit(gsum)
    args = (means, scales, quats, opac, sh)
    # warm-up/compile; float() forces host materialization — under remote
    # TPU transports block_until_ready alone does not guarantee completion
    float(gfn(*args))
    reps = 6
    t0 = time.time()
    for i in range(reps):
        # perturb one input so no layer can cache identical requests
        float(gfn(means + 1e-6 * i, *args[1:]))
    dt = (time.time() - t0) / reps

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
