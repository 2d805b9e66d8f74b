"""Parity tests for the fused KPConv aggregation kernel
(ops/kpconv_kernel.py) against the reference einsum formulation. The
kernel runs compiled on TPU only (models/kpconv.py auto-gate); CI
exercises it in interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp


def _run(B, M, He, C, K, D, seed=0):
    from gaussreg_tpu.ops.kpconv_kernel import (
        _fused_apply_impl,
        _reference_apply,
    )

    rng = np.random.default_rng(seed)
    nf = jnp.asarray(rng.normal(size=(B, M, He, C)), jnp.bfloat16)
    infl = jnp.asarray(
        np.maximum(rng.normal(size=(B, M, He, K)), 0), jnp.bfloat16
    )
    w = jnp.asarray(rng.normal(size=(K, C, D)), jnp.float32)
    ref = np.asarray(_reference_apply(nf, infl, w))
    kp = 16
    dp = ((D + 127) // 128) * 128
    infl_p = jnp.pad(infl, ((0, 0), (0, 0), (0, 0), (0, kp - K)))
    w2 = jnp.pad(
        w.astype(jnp.bfloat16), ((0, kp - K), (0, 0), (0, dp - D))
    ).reshape(kp * C, dp)
    out = np.asarray(
        _fused_apply_impl(
            nf.reshape(B * M, He * C),
            infl_p.reshape(B * M, He * kp),
            w2, he=He, kp=kp, c=C, block_rows=128, interpret=True,
        )
    )[:, :D].reshape(B, M, D)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out / scale, ref / scale, atol=5e-6)


def test_kpconv_fused_apply_matches_einsum():
    _run(1, 256, 40, 64, 15, 64)
    _run(2, 96, 32, 128, 15, 64)  # non-multiple of block_rows


def test_kpconv_fused_apply_grad_is_reference_grad():
    """custom_vjp: backward must equal the einsum formulation's gradients
    (training numerics unchanged)."""
    from gaussreg_tpu.ops.kpconv_kernel import (
        kpconv_fused_apply,
        _reference_apply,
    )

    rng = np.random.default_rng(3)
    nf = jnp.asarray(rng.normal(size=(1, 64, 8, 64)), jnp.bfloat16)
    infl = jnp.asarray(
        np.maximum(rng.normal(size=(1, 64, 8, 15)), 0), jnp.bfloat16
    )
    w = jnp.asarray(rng.normal(size=(15, 64, 64)), jnp.float32)

    g1 = jax.grad(lambda w_: jnp.sum(kpconv_fused_apply(nf, infl, w_) ** 2))(w)
    g2 = jax.grad(lambda w_: jnp.sum(_reference_apply(nf, infl, w_) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)
