#!/usr/bin/env python
"""A/B the Pallas stem weight-gradient kernel vs XLA's conv dW on the real
TPU at the s2d train-stem shapes (ROADMAP round-4: the [5,5,12,64] dW is
11.5 ms/step at batch 40, ~2% MFU from XLA's batch-minor layout).

Usage: python scripts/bench_pallas_dw.py [batch]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np


def timed(fn, *args, iters=20):
    import jax

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])  # host-fetch barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from dd3d_tpu.ops.pallas_conv import conv_dw_s1_same_pallas

    b = int(_sys.argv[1]) if len(_sys.argv) > 1 else 40
    cases = [
        ("stem 5x5x12->64", (b, 192, 640, 12), 5, 64),
        ("level0 3x3x64->64", (b, 192, 640, 64), 3, 64),
    ]
    rng = np.random.RandomState(0)
    for name, xshape, k, co in cases:
        x = jnp.asarray(rng.randn(*xshape), jnp.bfloat16)
        dy = jnp.asarray(rng.randn(xshape[0], xshape[1], xshape[2], co), jnp.bfloat16)
        wt = jnp.zeros((k, k, xshape[3], co), jnp.bfloat16)

        p = k // 2

        def xla_dw(x, dy):
            def f(w):
                return jax.lax.conv_general_dilated(
                    x, w, (1, 1), [(p, p), (p, p)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.vjp(f, wt)[1](dy)[0]

        xla_j = jax.jit(xla_dw)
        pal_j = jax.jit(lambda x, dy, k=k: conv_dw_s1_same_pallas(x, dy, k))

        a = np.asarray(xla_j(x, dy), np.float32)
        bb = np.asarray(pal_j(x, dy), np.float32)
        rel = np.max(np.abs(a - bb)) / max(np.max(np.abs(a)), 1e-6)
        t_xla = timed(xla_j, x, dy)
        t_pal = timed(pal_j, x, dy)
        flops = xshape[0] * xshape[1] * xshape[2] * k * k * xshape[3] * co * 2
        print(f"{name} batch={b}: XLA {t_xla:7.2f} ms ({flops/t_xla/1e9:6.1f} GFLOP/ms eff "
              f"{flops/(t_xla*1e-3)/197e12*100:4.1f}% MXU)  "
              f"pallas {t_pal:7.2f} ms ({flops/(t_pal*1e-3)/197e12*100:4.1f}% MXU)  "
              f"speedup {t_xla/t_pal:4.2f}x  relmax {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
