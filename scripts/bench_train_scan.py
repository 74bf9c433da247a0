"""Device-only train-step throughput scan: remat policy x batch size.

Synthetic batch at KITTI train resolution (384x1280); reports step ms and
imgs/s/chip for each configuration that fits HBM.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(1, _os.path.dirname(_os.path.abspath(__file__)))

import json, sys, time
import numpy as np
import jax, jax.numpy as jnp

from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.models import build_model
from dd3d_tpu.training.train_loop import create_train_state
from dd3d_tpu.training.train_step import make_train_step


def synth_batch(b, g=24, h=384, w=1280):
    rng = np.random.RandomState(0)
    k = np.array([[721.5, 0, 609.5], [0, 721.5, 172.8], [0, 0, 1]], np.float32)
    boxes2d = np.zeros((b, g, 4), np.float32)
    boxes2d[..., :2] = rng.rand(b, g, 2) * [w - 100, h - 100]
    boxes2d[..., 2:] = boxes2d[..., :2] + 20 + rng.rand(b, g, 2) * 80
    box3d = np.tile(np.array([1, 0, 0, 0, 600, 180, 25, 1.6, 3.9, 1.5], np.float32), (b, g, 1))
    return {
        "image": jnp.asarray((rng.rand(b, h, w, 3) * 255).astype(np.uint8)),
        "intrinsics": jnp.asarray(np.tile(k, (b, 1, 1))),
        "gt_boxes2d": jnp.asarray(boxes2d),
        "gt_classes": jnp.asarray(rng.randint(0, 5, (b, g)).astype(np.int32)),
        "gt_boxes3d": jnp.asarray(box3d),
        "gt_valid": jnp.asarray(rng.rand(b, g) < 0.7),
    }


def main():
    remats = sys.argv[1].split(",") if len(sys.argv) > 1 else ["none", "dots_with_no_batch_dims_saveable", "full"]
    batches = [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [16, 32]
    for remat in remats:
        for b in batches:
            cfg = get_experiment_cfg("dd3d_kitti_dla34")
            cfg.TPU.REMAT = remat
            model = build_model(cfg)
            batch = synth_batch(b)
            state = None
            try:
                state = create_train_state(cfg, model, batch)
                step = jax.jit(make_train_step(cfg, model), donate_argnums=(0,))
                state, metrics = step(state, batch)
                float(np.asarray(metrics["total_loss"]))
                iters = 8
                t0 = time.perf_counter()
                for _ in range(iters):
                    state, metrics = step(state, batch)
                float(np.asarray(metrics["total_loss"]))
                dt = (time.perf_counter() - t0) / iters
                row = {"remat": remat, "batch": b, "step_ms": round(dt * 1e3, 1),
                       "imgs_per_s": round(b / dt, 1)}
            except Exception as e:  # noqa: BLE001
                row = {"remat": remat, "batch": b, "error": type(e).__name__, "msg": str(e)[:160]}
            print(json.dumps(row), flush=True)
            del state, batch


if __name__ == "__main__":
    main()
