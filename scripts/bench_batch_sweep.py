"""Inference batch sweep on the real chip: find the throughput-optimal batch.

The compiled program has a ~30 ms batch-invariant component (ROADMAP); larger
batches amortize it until HBM runs out. Prints imgs/s per batch size.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.time()


def log(m):
    print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)


def main(batches):
    import jax
    import jax.numpy as jnp

    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.models import build_model
    from dd3d_tpu.models.dd3d import dd3d_inference

    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    int8 = "--int8" in sys.argv
    if int8:
        # Mirror bench.py's shipped static-int8 config via the shared helper.
        cfg.TPU.QUANT_INT8 = True
        cfg.TPU.QUANT_MIN_CH = 32
    model = build_model(cfg)
    h, w = 384, 1280
    rng = np.random.RandomState(0)
    k = np.array([[721.5, 0, 609.5], [0, 721.5, 172.8], [0, 0, 1]], np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(rng.rand(1, h, w, 3), jnp.float32), train=False
    )
    if int8:
        from dd3d_tpu.models.calibrate import prepare_static_scales

        calib = jnp.asarray(rng.rand(8, h, w, 3).astype(np.float32) * 255)
        cfg = prepare_static_scales(cfg, model, variables, [calib], tag="sweep")
    log("init done" + (" (static int8)" if int8 else ""))

    @jax.jit
    def infer(v, im, K):
        import dd3d_tpu.models.layers as L

        L.set_quant_from_cfg(cfg)  # trace-time, see layers.py
        return dd3d_inference(cfg, model.apply(v, im, train=False), K)

    for b in batches:
        try:
            images = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
            intr = jnp.asarray(np.tile(k, (b, 1, 1)))
            out = infer(variables, images, intr)
            float(np.asarray(out["scores"]).sum())  # host fetch = real barrier on axon
            iters = 10
            t1 = time.perf_counter()
            for _ in range(iters):
                out = infer(variables, images, intr)
            float(np.asarray(out["scores"]).sum())
            dt = time.perf_counter() - t1
            log(f"batch {b}: {b*iters/dt:.1f} imgs/s  ({dt/iters*1000:.1f} ms/batch)")
        except Exception as e:  # OOM etc.
            log(f"batch {b}: FAILED ({type(e).__name__}: {str(e)[:200]})")
            break


if __name__ == "__main__":
    main([int(x) for x in [a for a in sys.argv[1:] if not a.startswith("--")] or ["128", "160", "192", "224", "256"]])
