import glob, sys, time
import numpy as np, jax, jax.numpy as jnp
from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.models import build_model
from dd3d_tpu.training.train_loop import create_train_state
from dd3d_tpu.training.train_step import make_train_step

def synth(b, h, w, g=32):
    rng = np.random.RandomState(0)
    k = np.array([[721.5,0,609.5],[0,721.5,172.8],[0,0,1]], np.float32)
    b2 = rng.rand(b, g, 4).astype(np.float32) * 300
    b2[..., 2:] = b2[..., :2] + 50
    return {
        "image": jnp.asarray(rng.rand(b,h,w,3).astype(np.float32)*255),
        "intrinsics": jnp.asarray(np.tile(k,(b,1,1))),
        "gt_boxes2d": jnp.asarray(b2),
        "gt_classes": jnp.asarray(rng.randint(0,5,(b,g)).astype(np.int32)),
        "gt_boxes3d": jnp.asarray(np.tile(np.array([1,0,0,0,600,170,20,1.6,3.9,1.5],np.float32),(b,g,1))),
        "gt_valid": jnp.asarray((np.arange(g)[None] < 8).repeat(b,axis=0)),
    }

cfg = get_experiment_cfg("dd3d_kitti_dla34")
model = build_model(cfg)
batch = synth(40, 384, 1280)
state = create_train_state(cfg, model, batch)
step = jax.jit(make_train_step(cfg, model), donate_argnums=(0,))
state, m = step(state, batch)
float(np.asarray(m["total_loss"]))
jax.profiler.start_trace("/tmp/jtrace40")
for _ in range(3):
    state, m = step(state, batch)
float(np.asarray(m["total_loss"]))
jax.profiler.stop_trace()
print("trace files:", glob.glob("/tmp/jtrace40/**/*.xplane.pb", recursive=True))
