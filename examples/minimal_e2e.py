#!/usr/bin/env python
"""Minimal end-to-end usage of dd3d_tpu: config -> model -> loss -> inference.

Runs on whatever jax backend is available (CPU works; set small shapes).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import dd3d_tpu
    from dd3d_tpu.models.dd3d import dd3d_inference, dd3d_losses

    cfg = dd3d_tpu.get_experiment_cfg("dd3d_kitti_dla34")
    model = dd3d_tpu.build_model(cfg)

    b, h, w, g = 1, 128, 256, 8
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32) * 255)
    k = np.array([[200.0, 0, 128], [0, 200.0, 64], [0, 0, 1]], np.float32)
    batch = {
        "image": images,
        "intrinsics": jnp.asarray(np.tile(k, (b, 1, 1))),
        "gt_boxes2d": jnp.asarray(np.tile([90, 30, 170, 95], (b, g, 1)).astype(np.float32)),
        "gt_classes": jnp.zeros((b, g), jnp.int32),
        "gt_boxes3d": jnp.asarray(np.tile([1, 0, 0, 0, 130, 62, 12, 1.6, 3.9, 1.5], (b, g, 1)).astype(np.float32)),
        "gt_valid": jnp.asarray(np.arange(g)[None] < 1).repeat(b, axis=0),
    }

    variables = model.init(jax.random.PRNGKey(0), images, train=False)

    @jax.jit
    def loss_fn(variables, batch):
        outputs, _ = model.apply(variables, batch["image"], train=True, mutable=["batch_stats"])
        return dd3d_losses(cfg, outputs, batch)

    @jax.jit
    def infer_fn(variables, images, intrinsics):
        return dd3d_inference(cfg, model.apply(variables, images, train=False), intrinsics)

    losses = loss_fn(variables, batch)
    print("losses:", {k: float(v) for k, v in losses.items()})

    det = infer_fn(variables, images, batch["intrinsics"])
    print("detections:", {k: tuple(v.shape) for k, v in det.items()})


if __name__ == "__main__":
    main()
