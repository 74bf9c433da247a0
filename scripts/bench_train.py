#!/usr/bin/env python
"""Training-throughput benchmark on the current devices.

Measures the full compiled train step (fwd + loss + bwd + SGD update) at
KITTI training resolution. The reference's implied throughput is ~12
imgs/s per A100 (BASELINE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batch=16, h=384, w=1280, iters=10, remat="none"):
    import jax
    import jax.numpy as jnp

    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.models import build_model
    from dd3d_tpu.training.train_loop import create_train_state
    from dd3d_tpu.training.train_step import make_train_step

    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    cfg.TPU.REMAT = remat
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    g = 32
    k = np.array([[721.5, 0, 609.5], [0, 721.5, 172.8], [0, 0, 1]], np.float32)
    batch_data = {
        "image": jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32) * 255),
        "intrinsics": jnp.asarray(np.tile(k, (batch, 1, 1))),
        "gt_boxes2d": jnp.asarray(rng.rand(batch, g, 4).astype(np.float32) * 300),
        "gt_classes": jnp.asarray(rng.randint(0, 5, (batch, g)).astype(np.int32)),
        "gt_boxes3d": jnp.asarray(
            np.tile(np.array([1, 0, 0, 0, 600, 170, 20, 1.6, 3.9, 1.5], np.float32), (batch, g, 1))
        ),
        "gt_valid": jnp.asarray(np.arange(g)[None] < 8).repeat(batch, axis=0),
    }
    # make 2D boxes well-formed
    b2 = np.array(batch_data["gt_boxes2d"])  # writable copy
    b2[..., 2:] = b2[..., :2] + 50
    batch_data["gt_boxes2d"] = jnp.asarray(b2)

    state = create_train_state(cfg, model, batch_data)
    step_fn = jax.jit(make_train_step(cfg, model), donate_argnums=(0,))

    t0 = time.perf_counter()
    state, metrics = step_fn(state, batch_data)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s, loss={float(metrics['total_loss']):.3f}")

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, batch_data)
    float(metrics["total_loss"])  # host-fetch barrier
    dt = time.perf_counter() - t0
    print(f"train step: {dt / iters * 1e3:.1f} ms/step -> {batch * iters / dt:.1f} imgs/s "
          f"(vs ~12 imgs/s per A100 reference)")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("batch", nargs="?", type=int, default=16)
    p.add_argument("--remat", default="none")
    p.add_argument("--iters", type=int, default=10)
    a = p.parse_args()
    main(batch=a.batch, remat=a.remat, iters=a.iters)
