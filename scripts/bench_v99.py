"""DD3D-V2-99 KITTI inference throughput on one v5e chip: bf16 vs shipped
static-int8 config (the README's 193 imgs/s V99 number is a round-1 bf16
measurement at batch 32)."""
import sys, time
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.models import build_model
from dd3d_tpu.models.dd3d import dd3d_inference
from dd3d_tpu.models.calibrate import prepare_static_scales

b, h, w = int(sys.argv[1]) if len(sys.argv) > 1 else 64, 384, 1280
rng = np.random.RandomState(0)
images = jnp.asarray((rng.rand(b, h, w, 3) * 255).astype(np.uint8))
intr = jnp.asarray(np.tile(np.array([[721.5,0,609.5],[0,721.5,172.8],[0,0,1]], np.float32), (b,1,1)))

for mode in ("bf16", "int8"):
    cfg = get_experiment_cfg("dd3d_kitti_v99")
    if mode == "int8":
        cfg.TPU.QUANT_INT8 = True
        cfg.TPU.QUANT_MIN_CH = 32
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)
    if mode == "int8":
        cfg = prepare_static_scales(cfg, model, variables, [images], tag="v99")
    @jax.jit
    def infer(v, im, K, cfg=cfg, model=model):
        import dd3d_tpu.models.layers as L
        L.set_quant_from_cfg(cfg)
        return dd3d_inference(cfg, model.apply(v, im, train=False), K)
    out = infer(variables, images, intr)
    float(np.asarray(out["scores"]).sum())
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(variables, images, intr)
    float(np.asarray(out["scores"]).sum())
    dt = time.perf_counter() - t0
    print(f"v99 {mode} batch={b}: {b*iters/dt:.1f} imgs/s ({dt/iters*1e3:.1f} ms/batch)", flush=True)
    del variables, model
