"""A/B: dynamic-PTQ vs static-PTQ (calibrated scales) int8 inference on the
real TPU, with a QUANT_MIN_CH sweep under static scales.

Static scales delete the per-conv dynamic abs-max reduce + its extra
activation pass (BASELINE.md "next int8 lever"), which should (a) speed the
already-quantized wide convs and (b) move the profitable MIN_CH gate lower —
the dynamic passes were exactly why the narrow high-res convs lost.

Calibration here uses the same synthetic images the bench runs on (the
deployment flow calibrates on representative real frames via
scripts/calibrate_int8.py); throughput is scale-value-independent.

Usage: python scripts/bench_int8_static_ab.py [batch] [min_ch,min_ch,...]
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import dd3d_tpu.models.layers as L
    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.models import build_model
    from dd3d_tpu.models.dd3d import dd3d_inference

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    sweep = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [0, 32, 64, 128, 256]

    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    model = build_model(cfg)
    h, w = 384, 1280
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    intrinsics = jnp.asarray(
        np.tile(np.array([[721.5, 0, 609.5], [0, 721.5, 172.8], [0, 0, 1]], np.float32), (b, 1, 1))
    )
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(jax.random.PRNGKey(0), images[:1])

    # --- calibrate once on the bench inputs (min_ch=0 captures every conv) ---
    from calibrate_int8 import capture_scales

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    calib_cfg = cfg.clone()
    calib_cfg.TPU.QUANT_MIN_CH = 0
    scales = capture_scales(calib_cfg, model, variables, [images])
    scales_path = os.path.join(tempfile.gettempdir(), f"bench_int8_scales_{os.getpid()}.json")
    with open(scales_path, "w") as f:
        json.dump(scales, f)

    def run(quant, min_ch, static, iters=15):
        run_cfg = cfg.clone()
        run_cfg.TPU.QUANT_INT8 = quant
        run_cfg.TPU.QUANT_MIN_CH = min_ch
        run_cfg.TPU.QUANT_SCALES_PATH = scales_path if static else ""

        @jax.jit
        def infer(variables, images, intrinsics):
            L.set_quant_from_cfg(run_cfg)  # trace-time, see layers.py
            outputs = model.apply(variables, images, train=False)
            return dd3d_inference(run_cfg, outputs, intrinsics)

        out = infer(variables, images, intrinsics)
        float(np.asarray(out["scores"]).sum())  # host fetch = the only real barrier on axon
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(variables, images, intrinsics)
        float(np.asarray(out["scores"]).sum())
        return b * iters / (time.perf_counter() - t0)

    bf16 = run(False, 256, False)
    print(f"bf16                      : {bf16:8.1f} imgs/s (batch {b})", flush=True)
    dyn = run(True, 256, False)
    print(f"int8 dynamic  min_ch=256  : {dyn:8.1f} imgs/s ({dyn / bf16:.2f}x)", flush=True)
    for min_ch in sweep:
        s = run(True, min_ch, True)
        print(f"int8 static   min_ch={min_ch:<4d} : {s:8.1f} imgs/s ({s / bf16:.2f}x)", flush=True)
    os.unlink(scales_path)


if __name__ == "__main__":
    main()
