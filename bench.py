"""Benchmark: DD3D-DLA34 KITTI inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (full math in BASELINE.md "A100 inference baseline"):
the reference publishes no inference images/sec, so the bar is derived from
first principles and deliberately OVERESTIMATES the reference:
  - the compiled inference program is 215.6 GFLOP/img at 384x1280
    (XLA cost analysis, conv stack + decode + NMS);
  - an A100 at 25% fp16 MFU (0.25 x 312 TFLOP/s) would do
    0.25*312e12/215.6e9 = 362 imgs/s. 25% is generous: the reference's own
    measured TRAIN throughput (12 imgs/s/A100 implied by its published
    wall-clock) corresponds to ~2.5% MFU, and its inference path is
    dynamic-shape python-loop decode over a BN-heavy CNN.
vs_baseline = (our imgs/s/chip) / 362.
(Round-1 reports used a 60 imgs/s proxy bar = 5 x the reference's implied
train throughput; VERDICT r1 called that soft, hence this derivation.)
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.models import build_model
    from dd3d_tpu.models.dd3d import dd3d_inference

    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    # STATIC int8 PTQ (calibrated activation scales) — the shipped serving
    # configuration. Measured on v5e at batch 128: bf16 599 -> dynamic int8
    # 714 (min_ch=256) -> static int8 ~808 imgs/s (min_ch=32): constant
    # scales delete the per-conv dynamic abs-max passes, which also moves
    # the profitable channel gate down to 32 (sweep in ROADMAP round-4).
    # Drift pinned by tests/test_int8_infer.py + test_int8_static.py.
    cfg.TPU.QUANT_INT8 = True
    cfg.TPU.QUANT_MIN_CH = 32
    # Round 5: also quantize the norm-free predictor convs (+2%: 896 ->
    # 914 imgs/s measured; score drift ~1e-4, overfit AP A/B dAP = 0.00 —
    # scripts/overfit_smoke.py --int8-ab --quant-unfolded).
    cfg.TPU.QUANT_UNFOLDED = True
    model = build_model(cfg)

    # KITTI eval resolution: min side 384 -> (384, 1242) padded to /128.
    # Large batch amortizes per-call dispatch/latency overheads (measured
    # round 2: 543 imgs/s @96, 583 @128 on v5e; static-int8 sweep round 5:
    # 854.6 @128, 773.1 @192, 841.7 @256 — 128 stays optimal).
    # uint8 input: what the real loader feeds the device (data/mapper.py
    # keeps images in native dtype) — measured +0.7% over an f32 feed with
    # bit-identical detections (preprocess_image normalizes in f32 either
    # way), and quarters the input HBM read.
    b, h, w = 128, 384, 1280
    rng = np.random.RandomState(0)
    images = jnp.asarray((rng.rand(b, h, w, 3) * 255).astype(np.uint8))
    intrinsics = jnp.asarray(
        np.tile(np.array([[721.5, 0, 609.5], [0, 721.5, 172.8], [0, 0, 1]], np.float32), (b, 1, 1))
    )
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)

    # Calibrate static scales on the bench inputs (deployment calibrates on
    # representative frames via scripts/calibrate_int8.py; throughput does
    # not depend on the scale values).
    from dd3d_tpu.models.calibrate import prepare_static_scales

    cfg = prepare_static_scales(cfg, model, variables, [images], tag="bench")

    @jax.jit
    def infer(variables, images, intrinsics):
        import dd3d_tpu.models.layers as L

        L.set_quant_from_cfg(cfg)  # trace-time, see layers.py
        outputs = model.apply(variables, images, train=False)
        return dd3d_inference(cfg, outputs, intrinsics)

    # Warmup / compile. NOTE: on the axon tunnel platform block_until_ready
    # returns before execution completes; a host fetch is the only reliable
    # barrier, so we time the loop and fetch the last output (the device
    # stream executes calls in order, so the final fetch bounds all of them).
    out = infer(variables, images, intrinsics)
    float(np.asarray(out["scores"]).sum())

    iters = 15
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, images, intrinsics)
    float(np.asarray(out["scores"]).sum())
    dt = time.perf_counter() - t0

    imgs_per_sec = b * iters / dt
    print(
        json.dumps(
            {
                "metric": "dd3d_dla34_kitti_inference_imgs_per_sec_per_chip",
                "value": round(imgs_per_sec, 2),
                "unit": "imgs/s",
                "vs_baseline": round(imgs_per_sec / 362.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
