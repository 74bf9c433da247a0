import numpy as np
import jax.numpy as jnp
import pytest

from dd3d_tpu.evaluators.native import rotated_iou_matrix
from dd3d_tpu.ops.rotated_boxes import (
    boxes3d_corners_to_bev_boxes,
    pairwise_rotated_iou,
    rotated_nms_padded,
)
from dd3d_tpu.ops.nms import NEG_INF
from dd3d_tpu.structures.boxes3d import generic_corners


def test_jnp_rotated_iou_matches_native(rng):
    """The in-graph jnp IoU must agree with the C++ kernel."""
    n, m = 12, 9
    def rand_boxes(k):
        b = np.zeros((k, 5))
        b[:, 0:2] = rng.randn(k, 2) * 3
        b[:, 2:4] = rng.rand(k, 2) * 3 + 0.5
        b[:, 4] = rng.rand(k) * 360 - 180  # degrees
        return b
    a, b = rand_boxes(n), rand_boxes(m)
    ours = np.asarray(pairwise_rotated_iou(jnp.asarray(a), jnp.asarray(b)))
    # native kernel takes radians; mirror of angle convention preserves IoU
    a_r, b_r = a.copy(), b.copy()
    a_r[:, 4] = np.radians(a_r[:, 4])
    b_r[:, 4] = np.radians(b_r[:, 4])
    ref = rotated_iou_matrix(a_r, b_r)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_rotated_iou_known_values():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = jnp.asarray([[0.0, 0.0, 2.0, 2.0, 90.0]])
    # square rotated 90 deg == itself
    assert float(pairwise_rotated_iou(a, b)[0, 0]) == pytest.approx(1.0, abs=1e-5)
    c = jnp.asarray([[1.0, 0.0, 2.0, 2.0, 0.0]])
    assert float(pairwise_rotated_iou(a, c)[0, 0]) == pytest.approx(1.0 / 3.0, abs=1e-5)


def test_boxes3d_to_bev():
    # KITTI-upright box (object z = camera up): quat = x(+90deg), heading
    # along camera x; at (0, 0, 20) camera frame, size (w, l, h).
    s = np.sqrt(0.5)
    corners = generic_corners(
        jnp.asarray([[s, s, 0, 0]]), jnp.asarray([[0.0, 0.0, 20.0]]), jnp.asarray([[1.6, 3.9, 1.5]])
    )
    bev = np.asarray(boxes3d_corners_to_bev_boxes(corners))[0]
    # camera z=20 (forward) -> BEV y = -20: the reference's BEV frame has
    # forward = "up" in IMAGE coordinates, i.e. -y (bev_nms.py:33-41).
    assert bev[0] == pytest.approx(0.0, abs=1e-4)
    assert bev[1] == pytest.approx(-20.0, abs=1e-4)
    assert bev[2] == pytest.approx(1.6, abs=1e-4)  # width
    assert bev[3] == pytest.approx(3.9, abs=1e-4)  # length


def test_rotated_nms():
    boxes = jnp.asarray(
        [
            [0.0, 0.0, 2.0, 4.0, 10.0],
            [0.1, 0.0, 2.0, 4.0, 12.0],  # heavy overlap with 0
            [10.0, 0.0, 2.0, 4.0, 45.0],
            [0.0, 0.0, 2.0, 4.0, 10.0],  # duplicate of 0, other class
        ]
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    classes = jnp.asarray([0, 0, 0, 1])
    order, keep = rotated_nms_padded(boxes, scores, classes, iou_threshold=0.3)
    kept = sorted(np.asarray(order)[np.asarray(keep)].tolist())
    assert kept == [0, 2, 3]  # 1 suppressed by 0; 3 survives via class
