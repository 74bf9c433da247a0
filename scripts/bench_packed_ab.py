"""A/B: PACKED_HEADS on/off, inference at the bench config (batch 128)."""
import time, sys, numpy as np, jax, jax.numpy as jnp
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
t0 = time.time()
def log(m): print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)
from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.models import build_model
from dd3d_tpu.models.dd3d import dd3d_inference

b, h, w = 128, 384, 1280
rng = np.random.RandomState(0)
images_np = rng.rand(b, h, w, 3).astype(np.float32) * 255
intr_np = np.tile(np.array([[721.5, 0, 609.5], [0, 721.5, 172.8], [0, 0, 1]], np.float32), (b, 1, 1))

def bench(packed):
    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    cfg.TPU.PACKED_HEADS = packed
    model = build_model(cfg)
    images = jnp.asarray(images_np)
    intr = jnp.asarray(intr_np)
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)
    log(f"packed={packed} init done")

    @jax.jit
    def infer(v, im, K):
        return dd3d_inference(cfg, model.apply(v, im, train=False), K)

    out = infer(variables, images, intr)
    float(np.asarray(out["scores"]).sum())  # host fetch = real barrier on axon
    log(f"packed={packed} compiled")
    iters = 15
    t1 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, images, intr)
    float(np.asarray(out["scores"]).sum())
    dt = time.perf_counter() - t1
    log(f"packed={packed}: {b*iters/dt:.1f} imgs/s  ({dt/iters*1000:.1f} ms/batch)")
    return b * iters / dt

r0 = bench(False)
r1 = bench(True)
log(f"RESULT unpacked={r0:.1f} packed={r1:.1f} imgs/s ({(r1/r0-1)*100:+.1f}%)")
