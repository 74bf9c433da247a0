"""Device-side TTA A/B on the real TPU: canvas-bucket batching vs per-variant calls.

VERDICT r3 item 5: the (image x variant) canvas-bucket batching in
models/tta.py::infer_batch is structurally ~2x fewer device calls than the
reference's per-image chunked TTA loop (test_time_augmentation.py:118-133),
but on the 1-core dev box the wall clock is host-resize-bound, so the device
claim was never proven. This bench SKIPS the host resize entirely: it
synthesizes the padded canvases each scheme would produce for a chunk of
KITTI-sized images at the shipped TTA config (TEST.AUG.MIN_SIZES x flip) and
times only the device calls (host-fetch barrier — on axon
block_until_ready returns before execution finishes).

A = bucketed: one call per padded-canvas bucket, batch = chunk x variants-in-bucket
B = per-variant: one call per (image, variant) instance, batch 1 (reference shape)
C = per-image-chunk per-variant: one call per variant with the whole chunk
    batched (a stronger baseline than the reference's, for honesty)

Usage: python scripts/bench_tta_ab.py [chunk]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax

    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.models import build_model
    from dd3d_tpu.models.dd3d import dd3d_inference

    chunk = int(_sys.argv[1]) if len(_sys.argv) > 1 else 16
    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    min_sizes = list(cfg.TEST.AUG.MIN_SIZES)
    max_size = cfg.TEST.AUG.MAX_SIZE
    flip = bool(cfg.TEST.AUG.FLIP)
    div = 128
    h, w = 370, 1224  # KITTI

    # variant geometry (models/tta.py::_variants_hw)
    variants = []
    for size in min_sizes:
        scale = size / min(h, w)
        nh, nw = (size, int(round(scale * w))) if h < w else (int(round(scale * h)), size)
        if max(nh, nw) > max_size:
            s2 = max_size / max(nh, nw)
            nh, nw = int(nh * s2), int(nw * s2)
        for flipped in ([False, True] if flip else [False]):
            variants.append((nh, nw, flipped))
    buckets = {}
    for nh, nw, flipped in variants:
        ph = int(np.ceil(nh / div) * div)
        pw = int(np.ceil(nw / div) * div)
        buckets.setdefault((ph, pw), []).append((nh, nw, flipped))
    print(f"chunk={chunk} variants={len(variants)} buckets={len(buckets)}: "
          f"{[(k, len(v)) for k, v in buckets.items()]}", flush=True)

    variant_cfg = cfg.clone()
    variant_cfg.DD3D.INFERENCE.DO_NMS = False
    variant_cfg.DD3D.INFERENCE.DO_BEV_NMS = False
    model = build_model(variant_cfg)

    rng = np.random.RandomState(0)
    k = np.array([[721.5, 0, 609.5], [0, 721.5, 172.8], [0, 0, 1]], np.float32)

    import jax.numpy as jnp

    init_img = jnp.zeros((1, 384, 1280, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), init_img, train=False)

    if "--int8" in _sys.argv:
        # The shipped serving quantization, calibrated per TTA canvas shape
        # (tag-keyed scales serve every bucket from one merged file — the
        # same mechanism models/tta.py uses lazily per bucket).
        from dd3d_tpu.models.calibrate import prepare_static_scales

        variant_cfg.TPU.QUANT_INT8 = True
        variant_cfg.TPU.QUANT_MIN_CH = 32
        calib = [rng.rand(2, ph, pw, 3).astype(np.float32) * 255 for (ph, pw) in buckets]
        variant_cfg = prepare_static_scales(variant_cfg, model, variables,
                                            [jnp.asarray(c) for c in calib], tag="tta_ab")
        print("int8: static scales calibrated for", list(buckets), flush=True)

    def infer(variables, images, intrinsics):
        import dd3d_tpu.models.layers as _L

        _L.set_quant_from_cfg(variant_cfg)  # trace-time no-op unless int8
        outputs = model.apply(variables, images, train=False)
        return dd3d_inference(variant_cfg, outputs, intrinsics)

    infer_j = jax.jit(infer)

    def canvases(scheme):
        """List of (images, intrinsics) device-call payloads for a scheme."""
        calls = []
        if scheme == "A":  # bucketed
            for (ph, pw), insts in buckets.items():
                n = chunk * len(insts)
                calls.append((rng.rand(n, ph, pw, 3).astype(np.float32) * 255,
                              np.tile(k, (n, 1, 1))))
        elif scheme == "B":  # per (image, variant), batch 1
            for nh, nw, _f in variants:
                ph = int(np.ceil(nh / div) * div)
                pw = int(np.ceil(nw / div) * div)
                for _ in range(chunk):
                    calls.append((rng.rand(1, ph, pw, 3).astype(np.float32) * 255,
                                  np.tile(k, (1, 1, 1))))
        elif scheme == "C":  # per variant, chunk batched
            for nh, nw, _f in variants:
                ph = int(np.ceil(nh / div) * div)
                pw = int(np.ceil(nw / div) * div)
                calls.append((rng.rand(chunk, ph, pw, 3).astype(np.float32) * 255,
                              np.tile(k, (chunk, 1, 1))))
        return calls

    results = {}
    for scheme in ("A", "C", "B"):
        # Device-resident payloads: this measures the DEVICE-side cost of the
        # call pattern, not host->device transfer (which the axon tunnel
        # dominates and which is identical across schemes anyway).
        calls = [(jax.device_put(jnp.asarray(im)), jax.device_put(jnp.asarray(kk)))
                 for im, kk in canvases(scheme)]
        jax.block_until_ready([c[0] for c in calls])
        # warm up every distinct shape (compile)
        for im, kk in calls:
            out = infer_j(variables, im, kk)
        float(np.asarray(out["scores"]).sum())
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            outs = [infer_j(variables, im, kk) for im, kk in calls]
            # ONE host fetch per round: the barrier, not per-call sync
            float(np.asarray(outs[-1]["scores"]).sum())
        dt = (time.perf_counter() - t0) / iters
        ips = chunk / dt
        results[scheme] = dt
        del calls
        print(f"scheme {scheme}: {dt * 1e3:8.1f} ms/chunk  "
              f"{ips:6.1f} TTA-imgs/s", flush=True)
    print(f"bucketed speedup vs per-variant-batch-1: {results['B'] / results['A']:.2f}x; "
          f"vs per-variant-chunked: {results['C'] / results['A']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
