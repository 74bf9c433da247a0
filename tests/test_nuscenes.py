import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.models import build_model
from dd3d_tpu.models.dd3d import dd3d_inference
from dd3d_tpu.models.nuscenes_dd3d import nuscenes_dd3d_losses
from dd3d_tpu.structures.pose import Pose


def _nusc_cfg():
    cfg = get_experiment_cfg("dd3d_nusc_dla34")
    # Shrink for CPU-compile speed: the test exercises the attr/speed head +
    # loss wiring, which is tower-count independent (full-size coverage lives
    # in the slow e2e tests).
    cfg.FE.BACKBONE.NAME = "DLA-46-C"
    cfg.FE.BUILDER = "build_fcos_dla_fpn_backbone_p6"
    cfg.FE.OUT_FEATURES = ["p3", "p4", "p5", "p6"]
    cfg.FE.FPN.OUT_CHANNELS = 64
    cfg.DD3D.FCOS2D.NUM_CLS_CONVS = 1
    cfg.DD3D.FCOS2D.NUM_BOX_CONVS = 1
    cfg.DD3D.FCOS3D.NUM_CONVS = 1
    return cfg


def _batch(b=1, g=4):
    rng = np.random.RandomState(0)
    k = np.array([[400.0, 0, 128], [0, 400.0, 64], [0, 0, 1]], np.float32)
    batch = {
        "image": jnp.asarray(rng.rand(b, 64, 128, 3).astype(np.float32) * 255),
        "intrinsics": jnp.asarray(np.tile(k, (b, 1, 1))),
        "gt_boxes2d": jnp.asarray(np.tile(np.array([90, 30, 170, 95], np.float32), (b, g, 1))),
        "gt_classes": jnp.full((b, g), 3, jnp.int32),  # car
        "gt_boxes3d": jnp.asarray(
            np.tile(np.array([1, 0, 0, 0, 130, 62, 15, 1.9, 4.6, 1.7], np.float32), (b, g, 1))
        ),
        "gt_valid": jnp.asarray(np.arange(g)[None] < 1).repeat(b, axis=0),
        "gt_attributes": jnp.full((b, g), 1, jnp.int32),  # vehicle.parked
        "gt_speeds": jnp.full((b, g), 2.5, jnp.float32),
    }
    return batch


def test_nuscenes_model_and_losses():
    cfg = _nusc_cfg()
    model = build_model(cfg)
    batch = _batch()
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(jax.random.PRNGKey(0), batch["image"])
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, batch["image"])
    assert "attr_logits" in out and "speed" in out
    assert out["attr_logits"][0].shape[-1] == 4
    # speed is relu'd -> non-negative
    assert float(jnp.min(out["speed"][0])) >= 0.0

    def loss_fn(params):
        outputs, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch["image"], train=True, mutable=["batch_stats"],
        )
        losses = nuscenes_dd3d_losses(cfg, outputs, batch)
        return sum(losses.values()), losses

    (total, losses), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    assert "loss_attr" in losses and "loss_speed" in losses
    assert np.isfinite(float(total))
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads))

    # inference carries attributes/speeds
    det = jax.jit(lambda o, k: dd3d_inference(cfg, o, k))(out, batch["intrinsics"])
    assert "attributes" in det and "speeds" in det
    assert det["attributes"].shape == det["classes"].shape


def test_sample_aggregation_and_submission():
    from dd3d_tpu.models.cross_camera import get_group_idxs, nuscenes_sample_aggregate

    rng = np.random.RandomState(1)
    # two cameras of one sample, each with 2 dets; det 0 in both cameras is
    # the SAME physical object (duplicate in global frame) -> BEV NMS keeps 1.
    def make_det(cam_idx):
        n = 2
        # Upright in the Z-UP global frame (identity camera poses below make
        # the camera frame coincide with global): identity orientation.
        quat = np.tile([1.0, 0.0, 0.0, 0.0], (n, 1))
        tvec = np.array([[0.0, 1.0, 10.0], [5.0 + cam_idx * 3, 1.0, 20.0]])
        return {
            "image_id": f"img{cam_idx}",
            "sample_id": "tok",
            "classes": np.array([3, 3]),
            "scores": np.array([0.9, 0.5 + 0.1 * cam_idx]),
            "scores_3d": np.array([0.9 - 0.05 * cam_idx, 0.5 + 0.1 * cam_idx]),
            "boxes2d": rng.rand(n, 4) * 100,
            "quat": quat,
            "tvec": tvec,
            "size": np.tile([1.9, 4.6, 1.7], (n, 1)),
            "attributes": np.array([0, 1]),
            "speeds": np.array([3.0, 0.0]),
        }

    dets = [make_det(0), make_det(1)]
    # camera poses: both identity -> duplicate first dets overlap in global.
    poses = [Pose(), Pose()]
    groups = get_group_idxs(["tok", "tok"], 2)
    out = nuscenes_sample_aggregate(dets, groups, num_classes=10, global_poses=poses, iou_threshold=0.3)
    n_total = sum(len(d["classes"]) for d in out)
    # 4 dets in -> 3 out (one duplicate suppressed)
    assert n_total == 3
    assert len(out[0]["classes"]) == 2  # cam0 kept both (higher scores)
    assert len(out[1]["classes"]) == 1
    assert "quat_global" in out[0]

    # submission entries
    from dd3d_tpu.data.catalog import MetadataCatalog
    from dd3d_tpu.evaluators.nuscenes import NuscenesEvaluator

    md = MetadataCatalog.get("nusc_test_fixture")
    md["thing_classes"] = list(
        ("barrier", "bicycle", "bus", "car", "construction_vehicle", "motorcycle",
         "pedestrian", "traffic_cone", "trailer", "truck")
    )
    ev = NuscenesEvaluator("nusc_test_fixture", output_dir="/tmp/nusc_eval_test")
    ev.process(out, poses=poses)
    res = ev.evaluate()
    assert "nuscenes" in res
    import json

    with open("/tmp/nusc_eval_test/nusc_submission.json") as f:
        sub = json.load(f)
    assert len(sub["results"]["tok"]) == 3
    e = sub["results"]["tok"][0]
    assert e["detection_name"] == "car"
    assert len(e["translation"]) == 3 and len(e["rotation"]) == 4 and len(e["velocity"]) == 2
