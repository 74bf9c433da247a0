"""Cross-camera (multi-view sample) aggregation + global-frame BEV NMS.

Host-side rebuild of `tridet/modeling/dd3d/postprocessing.py`:
- transform per-camera boxes into a shared global frame via pose composition
  (postprocessing.py:24-50),
- class + sample-offset ids so NMS is per (sample, class) (:83-87),
- rotated BEV NMS over all cameras of a sample, capped at
  `max_num_dets_per_sample` (nuScenes allows 500), split back per image
  (:100-108),
- `get_group_idxs` grouping images by sample_token (:111-129).

Runs on host numpy using the native C++ rotated-IoU kernel — this is the
eval-time path operating on unpacked detections (already variable-length).
The in-graph equivalent for single-image BEV NMS lives in
dd3d_tpu/ops/rotated_boxes.py.
"""
from collections import OrderedDict, defaultdict
from typing import Dict, List, Optional

import numpy as np

from dd3d_tpu.evaluators.native import rotated_iou_matrix
from dd3d_tpu.ops.rotated_boxes import CAMERA_TO_BEV
from dd3d_tpu.structures.pose import Pose, _quat_to_matrix_np


def _corners_np(quat, tvec, size):
    """(N, 8, 3) corners, same layout as structures.boxes3d.generic_corners."""
    signs = np.array(
        [[1, 1, 1], [1, -1, 1], [1, -1, -1], [1, 1, -1], [-1, 1, 1], [-1, -1, 1], [-1, -1, -1], [-1, 1, -1]],
        dtype=np.float64,
    )
    lwh = size[:, [1, 0, 2]]
    corners_obj = 0.5 * lwh[:, None, :] * signs
    out = np.empty((len(quat), 8, 3))
    for i in range(len(quat)):
        r = _quat_to_matrix_np(quat[i] / np.linalg.norm(quat[i]))
        out[i] = corners_obj[i] @ r.T + tvec[i]
    return out


def boxes_to_bev5_np(quat, tvec, size, cam_to_global: Optional[Pose] = None):
    """Camera-frame boxes -> (N, 5) BEV rotated boxes [cx, cy, w, l, deg]."""
    corners = _corners_np(quat, tvec, size)
    if cam_to_global is not None:
        corners = corners @ cam_to_global.rotation_matrix.T + cam_to_global.tvec
        cam_to_bev = np.float64([[0, -1, 0], [-1, 0, 0], [0, 0, -1]])  # vehicle/world -> BEV only
    else:
        cam_to_bev = CAMERA_TO_BEV.astype(np.float64)
    top = corners[:, [0, 1, 5, 4], :]
    top_bev = top @ cam_to_bev.T
    top_bev = top_bev[..., :2]
    fl, fr, br, bl = top_bev[:, 0], top_bev[:, 1], top_bev[:, 2], top_bev[:, 3]
    length = np.linalg.norm(fl - bl, axis=1)
    width = np.linalg.norm(fl - fr, axis=1)
    center = (fl + br) / 2
    forward = fl - bl
    angle = np.degrees(np.arctan2(forward[:, 0], forward[:, 1]))
    return np.stack([center[:, 0], center[:, 1], width, length, angle], axis=1)


def greedy_rotated_nms_np(boxes5, scores, classes, iou_threshold):
    """Sequential class-aware rotated NMS; returns kept indices in score order.
    Matches d2 batched_nms_rotated semantics (suppress if IoU > threshold)."""
    order = np.argsort(-scores)
    # rotated IoU matrix (deg -> rad for the kernel)
    b = boxes5.copy().astype(np.float64)
    b[:, 4] = np.radians(b[:, 4])
    iou = rotated_iou_matrix(b[order], b[order])
    keep = []
    suppressed = np.zeros(len(order), dtype=bool)
    for i in range(len(order)):
        if suppressed[i]:
            continue
        keep.append(order[i])
        mask = (iou[i] > iou_threshold) & (classes[order] == classes[order[i]])
        mask[: i + 1] = False
        suppressed |= mask
    return np.asarray(keep, dtype=np.int64)


def get_group_idxs(sample_tokens: List[str], num_images_per_sample: int) -> Dict[str, List[int]]:
    """cf. postprocessing.py:111-129."""
    grouped = defaultdict(list)
    for idx, token in enumerate(sample_tokens):
        grouped[token].append(idx)
    sizes = {t: len(v) for t, v in grouped.items()}
    if not all(s == num_images_per_sample for s in sizes.values()):
        raise ValueError(f"Group sizes do not match {num_images_per_sample}: {sizes}")
    return OrderedDict(grouped)


def nuscenes_sample_aggregate(
    per_image_dets: List[dict],
    group_idxs: Dict[str, List[int]],
    num_classes: int,
    global_poses: List[Pose],
    iou_threshold: float,
    max_num_dets_per_sample: Optional[int] = 500,
    include_boxes3d_global: bool = True,
) -> List[dict]:
    """Aggregate detections across each sample's cameras with global BEV NMS.

    per_image_dets: unpacked per-image dicts (see models/postprocess.py) with
    quat/tvec/size/scores_3d/classes. Returns filtered per-image dicts (with
    `quat_global`/`tvec_global` when requested).
    """
    out = [None] * len(per_image_dets)
    for group_idx, (_token, idxs) in enumerate(group_idxs.items()):
        bev_list, score_list, cls_list, img_list, det_list = [], [], [], [], []
        glob_quat, glob_tvec = [], []
        for idx in idxs:
            det = per_image_dets[idx]
            pose = global_poses[idx]
            n = len(det["classes"])
            if n:
                # global-frame boxes (postprocessing.py:24-50)
                r_ws = pose.rotation_matrix
                quat_g = np.empty_like(det["quat"])
                for i in range(n):
                    r_wo = r_ws @ _quat_to_matrix_np(det["quat"][i] / np.linalg.norm(det["quat"][i]))
                    quat_g[i] = _matrix_to_quat_rowwise(r_wo)
                tvec_g = det["tvec"] @ r_ws.T + pose.tvec
                # boxes are ALREADY in the global frame: apply only the
                # vehicle->BEV axis swap (the reference passes
                # pose_cam_global=Pose() here, postprocessing.py:55) —
                # cam_to_global=identity selects that path.
                bev = boxes_to_bev5_np(quat_g, tvec_g, det["size"], cam_to_global=Pose())
                bev_list.append(bev)
                glob_quat.append(quat_g)
                glob_tvec.append(tvec_g)
                score_list.append(det["scores_3d"])
                cls_list.append(det["classes"] + group_idx * num_classes)
                img_list.append(np.full(n, idx))
                det_list.append(np.arange(n))
        if not bev_list:
            for idx in idxs:
                out[idx] = per_image_dets[idx]
            continue
        bev = np.concatenate(bev_list)
        scores = np.concatenate(score_list)
        classes = np.concatenate(cls_list)
        img_ids = np.concatenate(img_list)
        det_ids = np.concatenate(det_list)
        gq = np.concatenate(glob_quat)
        gt = np.concatenate(glob_tvec)

        keep = greedy_rotated_nms_np(bev, scores, classes, iou_threshold)
        if max_num_dets_per_sample:
            keep = keep[:max_num_dets_per_sample]

        for idx in idxs:
            sel_keep = keep[img_ids[keep] == idx]
            local = det_ids[sel_keep]
            det = per_image_dets[idx]
            new = {k: (v[local] if isinstance(v, np.ndarray) and len(v) == len(det["classes"]) else v) for k, v in det.items()}
            if include_boxes3d_global:
                mask_all = img_ids == idx
                new["quat_global"] = gq[mask_all][local]
                new["tvec_global"] = gt[mask_all][local]
            out[idx] = new
    return out


def _matrix_to_quat_rowwise(m):
    from dd3d_tpu.structures.pose import _matrix_to_quat_np

    return _matrix_to_quat_np(m)
