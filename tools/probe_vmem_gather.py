#!/usr/bin/env python
"""Probe: can a Pallas TPU kernel gather rows of a VMEM-resident table with a
traced int32 index vector? If yes, the rasterizer can keep per-gaussian data
(G, 8) in VMEM and gather per chunk, never materializing pair rows in HBM."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, K, C = 4096, 128, 8


def kernel(idx_ref, table_ref, out_ref):
    idx = idx_ref[0]  # (K,) int32
    rows = table_ref[idx]  # dynamic gather along sublanes?
    out_ref[...] = rows


def main():
    table = jnp.asarray(np.random.randn(G, C), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, G, size=(1, K)), jnp.int32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((K, C), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
        )(idx, table)
        ref = table[idx[0]]
        print("direct-index OK, max err", float(jnp.abs(out - ref).max()))
    except Exception as e:
        print("direct-index FAILED:", str(e)[:500])

    # variant: jnp.take
    def kernel2(idx_ref, table_ref, out_ref):
        idx = idx_ref[0]
        out_ref[...] = jnp.take(table_ref[...], idx, axis=0)

    try:
        out = pl.pallas_call(
            kernel2,
            out_shape=jax.ShapeDtypeStruct((K, C), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((G, C), memory_space=pltpu.VMEM),
            ],
        )(idx, table)
        ref = table[idx[0]]
        print("jnp.take OK, max err", float(jnp.abs(out - ref).max()))
    except Exception as e:
        print("jnp.take FAILED:", str(e)[:500])

    # variant: one-hot matmul gather (always works, but costs K*G MACs)
    def kernel3(idxv_ref, table_ref, out_ref):
        idxv = idxv_ref[...]  # (1, K) in VMEM
        gids = jax.lax.broadcasted_iota(jnp.int32, (K, G), 1)
        onehot = (gids == idxv.reshape(K, 1)).astype(jnp.float32)
        out_ref[...] = jax.lax.dot_general(
            onehot, table_ref[...],
            dimension_numbers=((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.float32,
        )

    try:
        out = pl.pallas_call(
            kernel3,
            out_shape=jax.ShapeDtypeStruct((K, C), jnp.float32),
            in_specs=[
                pl.BlockSpec((1, K), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, C), memory_space=pltpu.VMEM),
            ],
        )(idx, table)
        ref = table[idx[0]]
        print("one-hot matmul OK, max err", float(jnp.abs(out - ref).max()))
    except Exception as e:
        print("one-hot FAILED:", str(e)[:500])


if __name__ == "__main__":
    main()
