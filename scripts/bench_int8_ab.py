"""A/B: bf16 vs opt-in int8-PTQ inference throughput on the real TPU.

The v5e MXU's int8 peak is 2x its bf16 peak; layers.QUANT_INT8 runs every
norm-folded eval conv as a dynamic-PTQ int8 conv (see models/layers.py).
This measures whether the dequant/requant overhead leaves a net win at the
shipped bench config (batch 128, 384x1280). Accuracy drift is pinned by
tests/test_int8_infer.py; this script reports only throughput.

Usage: python scripts/bench_int8_ab.py [batch]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(quant: bool, b: int, iters: int = 15, min_ch: int = None):
    import jax
    import jax.numpy as jnp

    import dd3d_tpu.models.layers as L
    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.models import build_model
    from dd3d_tpu.models.dd3d import dd3d_inference

    L.QUANT_INT8 = quant
    if min_ch is not None:
        L.QUANT_MIN_CH = min_ch
    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    model = build_model(cfg)

    h, w = 384, 1280
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    intrinsics = jnp.asarray(
        np.tile(np.array([[721.5, 0, 609.5], [0, 721.5, 172.8], [0, 0, 1]], np.float32), (b, 1, 1))
    )
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)

    @jax.jit
    def infer(variables, images, intrinsics):
        outputs = model.apply(variables, images, train=False)
        return dd3d_inference(cfg, outputs, intrinsics)

    out = infer(variables, images, intrinsics)
    float(np.asarray(out["scores"]).sum())  # host fetch = the only real barrier on axon
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, images, intrinsics)
    float(np.asarray(out["scores"]).sum())
    dt = time.perf_counter() - t0
    return b * iters / dt


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    sweep = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [None]
    bf16 = run(False, b)
    print(f"bf16           : {bf16:8.1f} imgs/s (batch {b})", flush=True)
    for min_ch in sweep:
        i8 = run(True, b, min_ch=min_ch)
        tag = f"int8 min_ch={min_ch}" if min_ch is not None else "int8"
        print(f"{tag:15s}: {i8:8.1f} imgs/s (batch {b})  ({i8 / bf16:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
