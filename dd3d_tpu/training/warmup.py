"""Compile-cache warmup: precompile the train step for every resize bucket.

Multi-scale training (INPUT.RESIZE.MIN_SIZE_TRAIN) produces a handful of
static batch shapes; each first hit mid-training stalls the loop for a
compile. This AOT-compiles every bucket up front with `jit(...).lower(...)
.compile()` — no state is touched and the executables land in jit's cache
(plus the persistent compilation cache when enabled), so the training loop
never stalls. The reference has no analogue (PyTorch recompiles nothing,
but pays dynamic-shape overheads every step instead).
"""
import logging
import time
from typing import List, Tuple

import numpy as np

LOG = logging.getLogger(__name__)


def bucket_shapes(cfg, base_hw: Tuple[int, int] = (375, 1242), size_divisibility: int = 128) -> List[Tuple[int, int]]:
    """Padded (H, W) bucket per MIN_SIZE_TRAIN entry for a dataset whose
    native resolution is `base_hw`."""
    h0, w0 = base_hw
    shapes = set()
    for size in cfg.INPUT.RESIZE.MIN_SIZE_TRAIN:
        scale = size / min(h0, w0)
        nh, nw = (size, int(round(scale * w0))) if h0 < w0 else (int(round(scale * h0)), size)
        pad = lambda v: int(np.ceil(v / size_divisibility) * size_divisibility)
        shapes.add((pad(nh), pad(nw)))
    return sorted(shapes)


def precompile_train_step(cfg, step_fn_jitted, state, batch_size: int, shapes: List[Tuple[int, int]],
                          max_gt: int, extra_keys: Tuple[str, ...] = ()) -> None:
    """AOT-compile `step_fn_jitted` (a jax.jit-wrapped train step) for each
    bucket shape."""
    import jax.numpy as jnp

    for h, w in shapes:
        t0 = time.time()
        dummy = {
            "image": jnp.zeros((batch_size, h, w, 3), jnp.uint8),
            "intrinsics": jnp.tile(jnp.eye(3, dtype=jnp.float32) * 500, (batch_size, 1, 1)),
            "gt_boxes2d": jnp.zeros((batch_size, max_gt, 4), jnp.float32),
            "gt_classes": jnp.zeros((batch_size, max_gt), jnp.int32),
            "gt_boxes3d": jnp.zeros((batch_size, max_gt, 10), jnp.float32),
            "gt_valid": jnp.zeros((batch_size, max_gt), bool),
            "image_size": jnp.tile(jnp.asarray([h, w], jnp.int32), (batch_size, 1)),
        }
        if "color_jitter" in extra_keys:
            dummy["color_jitter"] = jnp.ones((batch_size, 3), jnp.float32)
        if "gt_attributes" in extra_keys:
            dummy["gt_attributes"] = jnp.zeros((batch_size, max_gt), jnp.int32)
            dummy["gt_speeds"] = jnp.zeros((batch_size, max_gt), jnp.float32)
        step_fn_jitted.lower(state, dummy).compile()
        LOG.info("Precompiled train step for bucket (%d, %d) in %.1fs", h, w, time.time() - t0)
