"""Bisect train-step time: train-mode forward, +loss, +grad, full step."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(1, _os.path.dirname(_os.path.abspath(__file__)))
import json, sys, time
import numpy as np
import jax, jax.numpy as jnp

from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.models import build_model
from dd3d_tpu.models.dd3d import dd3d_losses, model_strides
from dd3d_tpu.training.train_loop import create_train_state
from dd3d_tpu.training.train_step import make_train_step
from bench_train_scan import synth_batch

b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
cfg = get_experiment_cfg("dd3d_kitti_dla34")
model = build_model(cfg)
batch = synth_batch(b)
state = create_train_state(cfg, model, batch)
strides = model_strides(model)


def bench(fn, *args, iters=6):
    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    return round((time.perf_counter() - t0) / iters * 1e3, 1)


@jax.jit
def fwd_only(params, batch_stats, batch):
    out, _ = model.apply({"params": params, "batch_stats": batch_stats},
                         batch["image"], train=True, mutable=["batch_stats"])
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(out))


@jax.jit
def fwd_loss(params, batch_stats, batch):
    out, _ = model.apply({"params": params, "batch_stats": batch_stats},
                         batch["image"], train=True, mutable=["batch_stats"])
    losses = dd3d_losses(cfg, out, batch, strides=strides)
    return sum(losses.values())


@jax.jit
def grad_only(params, batch_stats, batch):
    def loss_fn(p):
        out, _ = model.apply({"params": p, "batch_stats": batch_stats},
                             batch["image"], train=True, mutable=["batch_stats"])
        return sum(dd3d_losses(cfg, out, batch, strides=strides).values())
    g = jax.grad(loss_fn)(params)
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(g))


step = jax.jit(make_train_step(cfg, model))

print(json.dumps({
    "batch": b,
    "fwd_train_ms": bench(fwd_only, state.params, state.batch_stats, batch),
    "fwd_loss_ms": bench(fwd_loss, state.params, state.batch_stats, batch),
    "grad_ms": bench(grad_only, state.params, state.batch_stats, batch),
    "full_step_ms": bench(lambda s, bt: step(s, bt)[1]["total_loss"], state, batch),
}))

