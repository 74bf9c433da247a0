"""End-to-end tests: overfit a tiny synthetic scene and drive the full
train -> infer -> evaluate loop (the TPU analogue of the reference's
overfit smoke experiment, SURVEY.md §4 item 1)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.models import build_model
from dd3d_tpu.models.dd3d import dd3d_inference
from dd3d_tpu.training.train_loop import create_train_state
from dd3d_tpu.training.train_step import make_train_step

from tests.test_kitti_data import kitti_root  # fixture reuse  # noqa: F401


def _scene_batch(b=2):
    """A fixed synthetic scene: one big car-like box per image."""
    rng = np.random.RandomState(0)
    h, w = 128, 256
    k = np.array([[200.0, 0, 128], [0, 200.0, 64], [0, 0, 1]], np.float32)
    images = rng.rand(b, h, w, 3).astype(np.float32) * 40 + 80
    # paint a bright structured "object" inside the GT box so the backbone has
    # a real visual feature to latch onto (noise-only images stall the 2D
    # regression branch via relu-dead predictors).
    for i in range(b):
        images[i, 30:95, 90:170] = 220.0
        images[i, 40:85, 100:160, 0] = 40.0
        images[i, 55:70, 120:140, 2] = 255.0
    g = 8
    gt_boxes2d = np.zeros((b, g, 4), np.float32)
    gt_classes = np.zeros((b, g), np.int32)
    gt_boxes3d = np.zeros((b, g, 10), np.float32)
    gt_valid = np.zeros((b, g), bool)
    for i in range(b):
        gt_boxes2d[i, 0] = [90, 30, 170, 95]
        # proj ctr at box center, depth 12m
        gt_boxes3d[i, 0] = [1, 0, 0, 0, 130, 62, 12.0, 1.6, 3.9, 1.5]
        gt_valid[i, 0] = True
    return {
        "image": jnp.asarray(images),
        "intrinsics": jnp.asarray(np.tile(k, (b, 1, 1))),
        "gt_boxes2d": jnp.asarray(gt_boxes2d),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_boxes3d": jnp.asarray(gt_boxes3d),
        "gt_valid": jnp.asarray(gt_valid),
        "image_size": jnp.asarray(np.tile([h, w], (b, 1))),
    }


@pytest.mark.slow
def test_overfit_loss_decreases_and_detects():
    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    cfg.SOLVER.BASE_LR = 0.002
    cfg.SOLVER.WARMUP_ITERS = 20
    cfg.SOLVER.STEPS = [100000]
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 10.0
    model = build_model(cfg)

    batch = _scene_batch()
    state = create_train_state(cfg, model, batch)
    step_fn = jax.jit(make_train_step(cfg, model), donate_argnums=(0,))

    losses = []
    for it in range(150):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    # should overfit hard on a fixed batch
    assert losses[-1] < 0.5 * losses[0], f"loss did not drop: {losses[0]:.3f} -> {losses[-1]:.3f}"

    # inference on the training image should find the object
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    outputs = model.apply(variables, batch["image"], train=False)
    det = jax.device_get(dd3d_inference(cfg, outputs, batch["intrinsics"]))
    valid = det["valid"][0]
    assert valid.any(), "no detections after overfit"
    best = np.argmax(np.where(valid, det["scores_3d"][0], -1))
    box = det["boxes2d"][0][best]
    gt = np.asarray([90, 30, 170, 95])
    iou_num = (min(box[2], gt[2]) - max(box[0], gt[0])) * (min(box[3], gt[3]) - max(box[1], gt[1]))
    iou = iou_num / ((box[2] - box[0]) * (box[3] - box[1]) + (gt[2] - gt[0]) * (gt[3] - gt[1]) - iou_num)
    assert iou > 0.5, f"best det {box} vs gt {gt}: iou {iou:.2f}"
    assert det["classes"][0][best] == 0
    # depth should be close to GT 12m
    depth = det["boxes3d_depth"][0][best][0]
    assert abs(depth - 12.0) < 3.0, f"depth {depth}"


@pytest.mark.slow
def test_train_cli_smoke(kitti_root, tmp_path):  # noqa: F811
    """Drive the real CLI end to end on the synthetic KITTI fixture."""
    import subprocess
    import sys

    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [
        sys.executable, os.path.join(repo, "scripts", "train.py"),
        "+experiments=dd3d_kitti_dla34",
        f"DATASET_ROOT={os.path.dirname(kitti_root)}",
        "DATASETS.TRAIN.NAME=kitti_3d_train",
        "DATASETS.TEST.NAME=kitti_3d_train",
        "SOLVER.IMS_PER_BATCH=2",
        "SOLVER.MAX_ITER=2",
        "SOLVER.CHECKPOINT_PERIOD=1000",
        "TEST.IMS_PER_BATCH=2",
        "TEST.EVAL_PERIOD=0",
        "TEST.AUG.ENABLED=False",  # per-variant compiles are too slow on CPU
        "INPUT.RESIZE.MIN_SIZE_TRAIN=[128]",
        "INPUT.RESIZE.MIN_SIZE_TEST=128",
        "DATALOADER.TRAIN.NUM_WORKERS=2",
        f"OUTPUT_ROOT={tmp_path}",
    ]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, f"STDOUT:\n{proc.stdout[-3000:]}\nSTDERR:\n{proc.stderr[-5000:]}"
    assert "kitti_box3d_r40" in proc.stderr + proc.stdout
