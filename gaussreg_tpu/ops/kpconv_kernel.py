"""Fused KPConv aggregation kernel: influence-weighted neighbor-feature
aggregation + kernel-weight contraction in one VMEM pass.

Why: the XLA form `einsum("bmhk,bmhc->bmkc")` is a (B*M)-batched matmul
with tiny dims (H<=49, K=15, C>=64). The TPU backend pads the K=15 minor
dim to 128 lanes, materializes a ~550 MB bf16 scratch at level-0 shapes
(2, 30720, 35, Kpad) and serializes the computation into 32 chunked
slices — 28 ms of the 108 ms eval forward (round-4/5 device traces,
while.30). This kernel never materializes the (K, C) outer-product
structure in HBM: per neighbor slot h it expands `infl_h` (128, Kp) and
`nf_h` (128, C) onto the shared (k, c) lane grid with two one-hot
expansion MATMULS (MXU: (128,Kp)@(Kp,Kp*C) and (128,C)@(C,Kp*C)),
multiply-accumulates in f32 VMEM, and finishes with one
(128, Kp*C) @ (Kp*C, D) weight matmul.

Numerics match the XLA path: bf16 products, f32 accumulation over h,
bf16 rounding before the weight contraction (the einsum pair did exactly
this via preferred_element_type=f32 + .astype(bf16)).

The backward is NOT a kernel: `kpconv_fused_apply` carries a custom_vjp
whose reverse pass re-derives gradients through the reference einsum
formulation — training steps keep their existing (XLA) backward, the
fused kernel serves the inference/serving path.

Reference twin: KPConv aggregation (reference
geotransformer/modules/kpconv/kpconv.py:79-122).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _expanders(kp: int, c: int):
    """One-hot lane expanders: E (Kp, Kp*C) puts slot k at lanes
    [k*C, (k+1)*C); T (C, Kp*C) puts channel c at lanes {k*C + c}."""
    e = np.zeros((kp, kp * c), np.float32)
    for k in range(kp):
        e[k, k * c : (k + 1) * c] = 1.0
    t = np.zeros((c, kp * c), np.float32)
    for cc in range(c):
        t[cc, cc::c] = 1.0
    return jnp.asarray(e, jnp.bfloat16), jnp.asarray(t, jnp.bfloat16)


def _kernel(he: int, kp: int, c: int, dp: int):
    kc = kp * c

    def kernel(nf_ref, infl_ref, w_ref, e_ref, t_ref, out_ref, acc):
        acc[...] = jnp.zeros((nf_ref.shape[0], kc), jnp.float32)
        e = e_ref[...]
        t = t_ref[...]
        for h in range(he):
            nfh = nf_ref[:, h * c : (h + 1) * c]  # (BR, C) bf16
            inflh = infl_ref[:, h * kp : (h + 1) * kp]  # (BR, Kp) bf16
            # Mosaic requires 32-bit matmul accumulators; the one-hot
            # expansions reproduce the bf16 operands exactly in f32, so
            # the f32 product + f32 accumulate matches the reference
            # einsum's bf16xbf16 -> f32 semantics
            rep = jax.lax.dot_general(
                inflh, e, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BR, Kp*C): infl broadcast over c
            til = jax.lax.dot_general(
                nfh, t, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (BR, Kp*C): features tiled over k
            acc[...] = acc[...] + rep * til
        out_ref[...] = jax.lax.dot_general(
            acc[...].astype(jnp.bfloat16), w_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("he", "kp", "c", "block_rows", "interpret")
)
def _fused_apply_impl(nf2, infl2, w2, he, kp, c, block_rows, interpret):
    bm = nf2.shape[0]
    dp = w2.shape[1]
    e, t = _expanders(kp, c)
    pad = (-bm) % block_rows
    if pad:
        nf2 = jnp.pad(nf2, ((0, pad), (0, 0)))
        infl2 = jnp.pad(infl2, ((0, pad), (0, 0)))
    bmp = nf2.shape[0]
    grid = (bmp // block_rows,)
    out = pl.pallas_call(
        _kernel(he, kp, c, dp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, he * c), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, he * kp), lambda i: (i, 0)),
            pl.BlockSpec((kp * c, dp), lambda i: (0, 0)),
            pl.BlockSpec((kp, kp * c), lambda i: (0, 0)),
            pl.BlockSpec((c, kp * c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, dp), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_rows, kp * c), jnp.float32)
        ],
        out_shape=jax.ShapeDtypeStruct((bmp, dp), jnp.float32),
        interpret=interpret,
    )(nf2, infl2, w2, e, t)
    return out[:bm]


def _reference_apply(nf, infl, weights):
    """The XLA einsum pair (models/kpconv.py) — backward oracle and
    numerical twin of the kernel. nf (B, M, He, C) bf16,
    infl (B, M, He, K) bf16, weights (K, C, D) -> (B, M, D) f32."""
    weighted = jnp.einsum(
        "bmhk,bmhc->bmkc", infl, nf, preferred_element_type=jnp.float32
    )
    return jnp.einsum(
        "bmkc,kcd->bmd",
        weighted.astype(jnp.bfloat16),
        weights.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def kpconv_fused_apply(nf, infl, weights):
    """out[b,m,d] = sum_{h,k,c} infl[b,m,h,k] nf[b,m,h,c] weights[k,c,d].

    nf: (B, M, He, C) bf16 gathered neighbor features, He % 8 == 0 and
        C % 64 == 0 (pad neighbor slots with zeros / sentinel gathers).
    infl: (B, M, He, K) bf16 kernel influences (zeros at padded slots).
    weights: (K, C, D) f32.
    Forward runs the Pallas kernel on TPU (reference einsums elsewhere);
    backward always differentiates the reference einsum formulation.
    """
    return _fused_forward(nf, infl, weights)


def _fused_forward(nf, infl, weights):
    b, m, he, c = nf.shape
    k = infl.shape[-1]
    d = weights.shape[-1]
    if jax.default_backend() != "tpu":
        return _reference_apply(nf, infl, weights)
    kp = 16
    assert k <= kp and he % 8 == 0 and c % 64 == 0, (k, he, c)
    dp = ((d + 127) // 128) * 128
    infl_p = jnp.pad(infl, ((0, 0), (0, 0), (0, 0), (0, kp - k)))
    w2 = jnp.pad(
        weights.astype(jnp.bfloat16),
        ((0, kp - k), (0, 0), (0, dp - d)),
    ).reshape(kp * c, dp)
    out = _fused_apply_impl(
        nf.reshape(b * m, he * c),
        infl_p.reshape(b * m, he * kp),
        w2,
        he=he, kp=kp, c=c, block_rows=128, interpret=False,
    )
    return out[:, :d].reshape(b, m, d)


def _fused_fwd(nf, infl, weights):
    return _fused_forward(nf, infl, weights), (nf, infl, weights)


def _fused_bwd(res, ct):
    nf, infl, weights = res
    _, vjp = jax.vjp(_reference_apply, nf, infl, weights)
    return vjp(ct)


kpconv_fused_apply.defvjp(_fused_fwd, _fused_bwd)
