import sys, time
sys.path.insert(0, "scripts")
import numpy as np, jax
from bench_train import main as _  # just for path side effects
from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.models import build_model
from dd3d_tpu.training.train_loop import create_train_state
from dd3d_tpu.training.train_step import make_train_step
from bench_train_scan import synth_batch

for s2d in (True,):
    for b in (16, 40):
        cfg = get_experiment_cfg("dd3d_kitti_dla34")
        cfg.TPU.S2D_STEM = s2d
        model = build_model(cfg)
        batch = synth_batch(b)
        state = create_train_state(cfg, model, batch)
        step = jax.jit(make_train_step(cfg, model), donate_argnums=(0,))
        state, m = step(state, batch)
        float(np.asarray(m["total_loss"]))
        iters = 8
        t0 = time.perf_counter()
        for _i in range(iters):
            state, m = step(state, batch)
        float(np.asarray(m["total_loss"]))
        dt = (time.perf_counter()-t0)/iters*1e3
        print(f"s2d={s2d} b={b}: {dt:.1f} ms/step -> {b/dt*1e3:.1f} imgs/s", flush=True)
