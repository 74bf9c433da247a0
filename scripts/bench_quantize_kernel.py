#!/usr/bin/env python
"""Microbenchmark the int8 QUANTIZE pass — the dominant cost of the shipped
static-int8 inference program (prof_trace r5: clamp_convert_fusion = 80.4
ms/step of 158 ms/step at batch 128, each pass ~4-5x off the HBM roofline
while the int8 convs themselves run at ~97% MXU utilization).

Times, on a tower-conv-sized activation [128, 48, 160, 256]:
  copy_bf16      : bf16 -> bf16 identity+1 (pure bandwidth reference)
  conv_only      : bf16 -> s8 plain convert (no scale/round/clip)
  quant_div      : the shipped expression  clip(round(f32(x)/s), ±127) -> s8
  quant_mul      : same but multiply by 1/s (constant)
  quant_bf16     : round/clip computed in bf16 (no f32 upcast)
  quant_pallas   : hand-tiled pallas quantize kernel
  requant_s8     : s8 -> s8 rescale (the tower-chain pattern XLA emits)

Each timed with a host-fetch barrier (axon block_until_ready returns early).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, iters=30):
    import jax

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])  # barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    shape = (128, 48, 160, 256)
    if len(sys.argv) > 1:
        shape = tuple(int(x) for x in sys.argv[1].split(","))
    n = int(np.prod(shape))
    rng = np.random.RandomState(0)
    x_bf16 = jnp.asarray(rng.randn(*shape).astype(np.float32), jnp.bfloat16)
    x_s8 = jnp.asarray(rng.randint(-127, 128, shape), jnp.int8)
    s = jnp.float32(0.0312)

    @jax.jit
    def copy_bf16(x):
        return x + jnp.bfloat16(1)

    @jax.jit
    def conv_only(x):
        return x.astype(jnp.int8)

    @jax.jit
    def quant_div(x):
        xf = x.astype(jnp.float32)
        return jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)

    inv = jnp.float32(1.0 / 0.0312)

    @jax.jit
    def quant_mul(x):
        xf = x.astype(jnp.float32)
        return jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)

    @jax.jit
    def quant_bf16(x):
        return jnp.clip(jnp.round(x * inv.astype(jnp.bfloat16)), -127, 127).astype(jnp.int8)

    @jax.jit
    def requant_s8(x):
        xf = x.astype(jnp.float32)
        return jnp.clip(jnp.round(xf * jnp.float32(0.73)), -127, 127).astype(jnp.int8)

    def make_pallas(shape):
        from jax.experimental import pallas as pl

        B, H, W, C = shape
        # collapse to rows x C; tile rows by 512 (keeps ~512x256 bf16 = 256KB
        # blocks in VMEM), lanes = C
        rows = B * H * W
        TR = 2048

        def kernel(x_ref, o_ref):
            o_ref[...] = jnp.clip(
                jnp.round(x_ref[...].astype(jnp.float32) * inv), -127, 127
            ).astype(jnp.int8)

        @jax.jit
        def quant_pallas(x):
            x2 = x.reshape(rows, C)
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((rows, C), jnp.int8),
                grid=(rows // TR,),
                in_specs=[pl.BlockSpec((TR, C), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((TR, C), lambda i: (i, 0)),
            )(x2)
            return out.reshape(shape)

        return quant_pallas

    results = {}
    results["copy_bf16"] = timed(copy_bf16, x_bf16)
    results["conv_only"] = timed(conv_only, x_bf16)
    results["quant_div"] = timed(quant_div, x_bf16)
    results["quant_mul"] = timed(quant_mul, x_bf16)
    results["quant_bf16"] = timed(quant_bf16, x_bf16)
    results["requant_s8"] = timed(requant_s8, x_s8)
    try:
        results["quant_pallas"] = timed(make_pallas(shape), x_bf16)
    except Exception as e:  # pallas availability / tiling errors
        results["quant_pallas"] = f"FAILED: {type(e).__name__}: {e}"

    gb_rw = {
        "copy_bf16": n * 4,
        "conv_only": n * 3,
        "quant_div": n * 3,
        "quant_mul": n * 3,
        "quant_bf16": n * 3,
        "requant_s8": n * 2,
        "quant_pallas": n * 3,
    }
    print(f"shape {shape} = {n/1e6:.1f}M elements")
    for k, v in results.items():
        if isinstance(v, str):
            print(f"{k:14s} {v}")
        else:
            bw = gb_rw[k] / v / 1e6  # bytes / ms -> GB/s
            print(f"{k:14s} {v:7.3f} ms   {bw:7.1f} GB/s effective")


if __name__ == "__main__":
    main()
