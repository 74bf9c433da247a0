"""In-graph cross-camera (sample-level) BEV NMS.

Device twin of `models/cross_camera.py::nuscenes_sample_aggregate`
(reference: tridet/modeling/dd3d/postprocessing.py:22-108): all cameras of a
sample are processed as one fixed-size batch — boxes are rotated into the
shared global frame by each camera's pose, converted to BEV rotated
rectangles (vehicle->BEV axis swap, layers/bev_nms.py:37-47), and suppressed
with one class-aware rotated NMS across the whole sample. Everything is
shape-static, so a full 6-camera nuScenes sample is ONE XLA program instead
of a host loop.
"""
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dd3d_tpu.ops.geometry import unproject_points2d
from dd3d_tpu.ops.nms import NEG_INF, greedy_suppress
from dd3d_tpu.ops.quaternion import quaternion_multiply, quaternion_to_matrix
from dd3d_tpu.ops.rotated_boxes import VEHICLE_TO_BEV, corners_to_rotated_box, pairwise_rotated_iou
from dd3d_tpu.structures.boxes3d import generic_corners


def sample_bev_nms_in_graph(
    det: Dict[str, jnp.ndarray],  # (C, D) padded per-camera detections
    intrinsics: jnp.ndarray,  # (C, 3, 3)
    pose_quat: jnp.ndarray,  # (C, 4) camera->global wxyz
    pose_tvec: jnp.ndarray,  # (C, 3)
    iou_threshold: float,
    max_dets: Optional[int] = 500,
) -> Dict[str, jnp.ndarray]:
    """Returns `det` with `valid` reduced by global-frame BEV NMS and
    `quat_global` / `tvec_global` fields added."""
    c, d = det["valid"].shape

    inv_k = jnp.linalg.inv(intrinsics.astype(jnp.float32))
    ray = unproject_points2d(det["boxes3d_proj_ctr"].astype(jnp.float32), inv_k)
    tvec_cam = ray * det["boxes3d_depth"].astype(jnp.float32)

    # camera -> global (postprocessing.py:24-50)
    quat_g = quaternion_multiply(pose_quat[:, None, :].astype(jnp.float32), det["boxes3d_quat"].astype(jnp.float32))
    r_pose = quaternion_to_matrix(pose_quat.astype(jnp.float32))  # (C, 3, 3)
    tvec_g = jnp.einsum("cij,cdj->cdi", r_pose, tvec_cam, precision=jax.lax.Precision.HIGHEST) + pose_tvec[:, None, :].astype(jnp.float32)

    corners = generic_corners(quat_g, tvec_g, det["boxes3d_size"].astype(jnp.float32))
    # boxes already in the global/vehicle frame -> only the vehicle->BEV swap
    # (sample_bev_nms passes pose_cam_global=Pose(), postprocessing.py:55).
    top = corners[..., jnp.asarray([0, 1, 5, 4]), :]
    top_bev = jnp.einsum("ij,cdkj->cdki", jnp.asarray(VEHICLE_TO_BEV), top, precision=jax.lax.Precision.HIGHEST)[..., :2]
    bev5 = corners_to_rotated_box(top_bev)  # (C, D, 5)

    # flatten the sample; sort by score like the host path
    flat_bev = bev5.reshape(c * d, 5)
    scores = jnp.where(det["valid"], det["scores_3d"].astype(jnp.float32), NEG_INF).reshape(c * d)
    classes = det["classes"].reshape(c * d)

    order = jnp.argsort(-scores)
    iou = pairwise_rotated_iou(flat_bev[order], flat_bev[order])
    same = classes[order][:, None] == classes[order][None, :]
    iou = jnp.where(same, iou, 0.0)
    keep_sorted = greedy_suppress(iou, scores[order] > NEG_INF / 2, iou_threshold)
    if max_dets:
        rank = jnp.cumsum(keep_sorted.astype(jnp.int32)) - 1
        keep_sorted = keep_sorted & (rank < max_dets)
    keep = jnp.zeros((c * d,), bool).at[order].set(keep_sorted)
    keep = keep.reshape(c, d)

    out = dict(det)
    out["valid"] = det["valid"] & keep
    out["scores_3d"] = jnp.where(out["valid"], det["scores_3d"], 0.0)
    out["quat_global"] = quat_g
    out["tvec_global"] = tvec_g
    return out
