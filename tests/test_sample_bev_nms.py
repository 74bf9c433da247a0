"""In-graph sample BEV NMS must agree with the host aggregation path."""
import numpy as np
import jax.numpy as jnp

from dd3d_tpu.models.cross_camera import get_group_idxs, nuscenes_sample_aggregate
from dd3d_tpu.ops.sample_bev_nms import sample_bev_nms_in_graph
from dd3d_tpu.structures.pose import Pose


def test_in_graph_matches_host(rng):
    c, d = 2, 16  # two cameras, 16 padded detections each
    k = np.array([[400.0, 0, 200], [0, 400.0, 120], [0, 0, 1]], np.float32)
    s2 = np.sqrt(0.5)

    # camera poses: cam1 yawed 90deg about global z and shifted
    poses = [Pose(), Pose(wxyz=[s2, 0, 0, s2], tvec=[1.0, 2.0, 0.0])]

    det = {}
    n_valid = [6, 5]
    # Boxes upright in the Z-UP global frame: object +z (height) == global
    # +z, i.e. identity global orientation. (cam0's pose is identity, so its
    # "camera" frame coincides with the global frame in this fixture.)
    quat = np.tile([1.0, 0, 0, 0], (c, d, 1)).astype(np.float32)
    proj_ctr = rng.rand(c, d, 2).astype(np.float32) * np.array([400, 240]) + 1
    depth = (rng.rand(c, d, 1).astype(np.float32) * 30 + 5)
    size = np.tile([1.9, 4.6, 1.7], (c, d, 1)).astype(np.float32)
    # duplicate a physical object across cameras: same GLOBAL position.
    # cam0 sees an object at global (0, 1, 12); cam1's frame maps it back.
    proj0 = k @ np.array([0.0, 1.0, 12.0])
    proj_ctr[0, 0] = proj0[:2] / proj0[2]
    depth[0, 0] = 12.0
    p_inv = poses[1].inverse()
    cam1_pt = p_inv * np.array([[0.0, 1.0, 12.0]])
    proj1 = k @ cam1_pt[0]
    proj_ctr[1, 0] = proj1[:2] / proj1[2]
    depth[1, 0] = cam1_pt[0][2]
    # cam1's quat for the same global orientation: q_cam1 = pose1^-1 * q_global
    from dd3d_tpu.data.datasets.kitti_3d import _quat_multiply_np

    q_global = _quat_multiply_np(poses[0].quat, [1.0, 0, 0, 0])
    quat[1, 0] = _quat_multiply_np(p_inv.quat, q_global)
    # all other cam1 boxes also get cam1-frame orientations
    for j in range(1, d):
        quat[1, j] = _quat_multiply_np(p_inv.quat, [1.0, 0, 0, 0])

    scores = rng.rand(c, d).astype(np.float32) * 0.5 + 0.2
    scores[0, 0] = 0.95
    scores[1, 0] = 0.90
    valid = np.zeros((c, d), bool)
    for i in range(c):
        valid[i, : n_valid[i]] = True
    classes = np.zeros((c, d), np.int32)

    det = {
        "boxes3d_quat": jnp.asarray(quat),
        "boxes3d_proj_ctr": jnp.asarray(proj_ctr),
        "boxes3d_depth": jnp.asarray(depth),
        "boxes3d_size": jnp.asarray(size),
        "scores_3d": jnp.asarray(np.where(valid, scores, 0.0)),
        "classes": jnp.asarray(classes),
        "valid": jnp.asarray(valid),
    }
    intr = jnp.asarray(np.tile(k, (c, 1, 1)))
    pq = jnp.asarray(np.stack([p.quat for p in poses]).astype(np.float32))
    pt = jnp.asarray(np.stack([p.tvec for p in poses]).astype(np.float32))

    out = sample_bev_nms_in_graph(det, intr, pq, pt, iou_threshold=0.3)
    keep_graph = np.asarray(out["valid"])

    # host path on the unpacked detections
    host_dets = []
    for i in range(c):
        sel = valid[i]
        inv_k = np.linalg.inv(k)
        rays = np.concatenate([proj_ctr[i][sel], np.ones((sel.sum(), 1))], axis=1) @ inv_k.T
        host_dets.append(
            {
                "image_id": f"cam{i}",
                "sample_id": "tok",
                "classes": classes[i][sel],
                "scores": scores[i][sel],
                "scores_3d": scores[i][sel],
                "boxes2d": np.zeros((sel.sum(), 4)),
                "quat": quat[i][sel].astype(np.float64),
                "tvec": rays * depth[i][sel],
                "size": size[i][sel].astype(np.float64),
            }
        )
    groups = get_group_idxs(["tok", "tok"], 2)
    host_out = nuscenes_sample_aggregate(host_dets, groups, 10, poses, iou_threshold=0.3)
    host_counts = [len(x["classes"]) for x in host_out]

    # the duplicate (cam1, det0) must be suppressed by (cam0, det0) in both.
    assert not keep_graph[1, 0]
    assert keep_graph[0, 0]
    # identical surviving counts per camera
    np.testing.assert_array_equal(keep_graph.sum(axis=1), host_counts)
