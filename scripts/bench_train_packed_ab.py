"""A/B: PACKED_HEADS_TRAIN on/off, full train step at batch 40 (the
bench_train config: 384x1280, s2d train stem default)."""
import time, sys, numpy as np, jax, jax.numpy as jnp
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
t0 = time.time()
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)
from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.models import build_model
from dd3d_tpu.training.train_loop import create_train_state
from dd3d_tpu.training.train_step import make_train_step

b, h, w, g = 40, 384, 1280, 32
rng = np.random.RandomState(0)
k = np.array([[721.5, 0, 609.5], [0, 721.5, 172.8], [0, 0, 1]], np.float32)
batch_np = {
    "image": rng.rand(b, h, w, 3).astype(np.float32) * 255,
    "intrinsics": np.tile(k, (b, 1, 1)),
    "gt_boxes2d": np.tile(np.array([100, 100, 400, 300], np.float32), (b, g, 1)),
    "gt_classes": np.zeros((b, g), np.int32),
    "gt_boxes3d": np.tile(np.array([1, 0, 0, 0, 250, 200, 20, 1.6, 3.9, 1.5], np.float32), (b, g, 1)),
    "gt_valid": (np.arange(g)[None] < 8).repeat(b, axis=0),
}

def bench(packed):
    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    cfg.TPU.PACKED_HEADS_TRAIN = packed
    model = build_model(cfg)
    batch = {kk: jnp.asarray(v) for kk, v in batch_np.items()}
    state = create_train_state(cfg, model, batch)
    step_fn = jax.jit(make_train_step(cfg, model), donate_argnums=(0,))
    log(f"packed={packed} built")
    state, metrics = step_fn(state, batch)
    float(np.asarray(metrics["total_loss"]))
    log(f"packed={packed} compiled")
    iters = 10
    t1 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, batch)
    float(np.asarray(metrics["total_loss"]))
    dt = time.perf_counter() - t1
    log(f"packed={packed}: {b*iters/dt:.1f} imgs/s  ({dt/iters*1000:.1f} ms/step)")
    return b * iters / dt

r0 = bench(False)
r1 = bench(True)
log(f"RESULT unpacked={r0:.1f} packed={r1:.1f} imgs/s ({(r1/r0-1)*100:+.1f}%)")
