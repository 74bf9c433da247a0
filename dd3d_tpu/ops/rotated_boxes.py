"""Rotated-rectangle IoU and BEV NMS, shape-static in pure jnp.

In-graph replacement for detectron2's `batched_nms_rotated` CUDA op used by
the reference BEV NMS (tridet/layers/bev_nms.py:8,132). Geometry follows the
reference's BEV conventions:
- camera->vehicle->BEV axis-swap rotations (bev_nms.py:27-47),
- top-face corners [0, 1, 5, 4] of the 3D box -> 5-param rotated box
  (cx, cy, width, length, CCW angle in degrees) (bev_nms.py:51-96).

The convex-quad intersection is a fixed-size Sutherland–Hodgman clip
(8 vertex slots, validity counts) so the whole NMS stays one XLA program.
"""
import jax
import jax.numpy as jnp
import numpy as np

from dd3d_tpu.ops.nms import NEG_INF, greedy_suppress

# Rotation camera -> vehicle (z->x fwd, x->-y right, y->-z down), then
# vehicle -> BEV; composed 3x3 (bev_nms.py:27-47).
CAMERA_TO_VEHICLE = np.float32([[0, 0, 1], [-1, 0, 0], [0, -1, 0]])
VEHICLE_TO_BEV = np.float32([[0, -1, 0], [-1, 0, 0], [0, 0, -1]])
CAMERA_TO_BEV = VEHICLE_TO_BEV @ CAMERA_TO_VEHICLE


def corners_to_rotated_box(top_corners_bev: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 2) top-face corners (front-left, front-right, back-right,
    back-left) -> (..., 5) [cx, cy, w, l, angle_deg CCW]. cf. bev_nms.py:77-95."""
    fl = top_corners_bev[..., 0, :]
    fr = top_corners_bev[..., 1, :]
    br = top_corners_bev[..., 2, :]
    bl = top_corners_bev[..., 3, :]
    length = jnp.linalg.norm(fl - bl, axis=-1)
    width = jnp.linalg.norm(fl - fr, axis=-1)
    center = (fl + br) / 2.0
    forward = fl - bl
    angle = jnp.arctan2(forward[..., 0], forward[..., 1]) * 180.0 / jnp.pi
    return jnp.stack([center[..., 0], center[..., 1], width, length, angle], axis=-1)


def boxes3d_corners_to_bev_boxes(corners: jnp.ndarray, cam_to_bev: jnp.ndarray = None) -> jnp.ndarray:
    """(..., 8, 3) camera-frame box corners -> (..., 5) BEV rotated boxes."""
    if cam_to_bev is None:
        cam_to_bev = jnp.asarray(CAMERA_TO_BEV)
    top = corners[..., jnp.asarray([0, 1, 5, 4]), :]  # bev_nms.py:72
    top_bev = jnp.einsum("ij,...kj->...ki", cam_to_bev, top, precision=jax.lax.Precision.HIGHEST)[..., :2]
    return corners_to_rotated_box(top_bev)


def _rotated_corners(box5: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) -> (..., 4, 2) corners.

    Angle convention: clockwise rotation [[c, s], [-s, c]] — the SAME as the
    reference CUDA kernel (rotate_iou.py:205-226) and consistent with
    `corners_to_rotated_box`'s atan2(forward_x, forward_y) heading (an angle
    measured clockwise from +y). Corner order is then CW in standard axes.
    """
    ang = box5[..., 4] * jnp.pi / 180.0
    c, s = jnp.cos(ang), jnp.sin(ang)
    hx, hy = box5[..., 2] / 2, box5[..., 3] / 2
    lx = jnp.stack([hx, -hx, -hx, hx], axis=-1)
    ly = jnp.stack([hy, hy, -hy, -hy], axis=-1)
    x = c[..., None] * lx + s[..., None] * ly + box5[..., 0:1]
    y = -s[..., None] * lx + c[..., None] * ly + box5[..., 1:2]
    return jnp.stack([x, y], axis=-1)


def _clip_halfplane(poly, nv, a, b):
    """Clip an (8, 2) polygon (nv valid, CCW) by the left half-plane of a->b."""
    v = poly.shape[0]
    i = jnp.arange(v)
    nxt_idx = jnp.where(i + 1 >= nv, 0, i + 1)
    cur = poly
    nxt = poly[nxt_idx]
    e = b - a
    # Interior is LEFT of each edge: corners from `_rotated_corners` stay
    # CCW-ordered (the clockwise-angle map [[c, s], [-s, c]] is a proper
    # rotation of the CCW-ordered local corners).
    d_cur = e[0] * (cur[:, 1] - a[1]) - e[1] * (cur[:, 0] - a[0])
    d_nxt = e[0] * (nxt[:, 1] - a[1]) - e[1] * (nxt[:, 0] - a[0])
    valid_in = i < nv
    in_cur = d_cur >= 0
    in_nxt = d_nxt >= 0
    denom = d_cur - d_nxt
    t = d_cur / jnp.where(jnp.abs(denom) < 1e-12, jnp.where(denom < 0, -1e-12, 1e-12), denom)
    inter = cur + t[:, None] * (nxt - cur)

    emit = jnp.zeros((2 * v, 2), dtype=poly.dtype)
    emit = emit.at[0::2].set(cur)
    emit = emit.at[1::2].set(inter)
    valid = jnp.zeros((2 * v,), dtype=bool)
    valid = valid.at[0::2].set(in_cur & valid_in)
    valid = valid.at[1::2].set((in_cur != in_nxt) & valid_in)

    order = jnp.argsort(~valid, stable=True)
    emit = emit[order][:v]
    new_nv = jnp.minimum(jnp.sum(valid), v).astype(jnp.int32)
    return emit, new_nv


def _poly_area(poly, nv):
    v = poly.shape[0]
    i = jnp.arange(v)
    nxt_idx = jnp.where(i + 1 >= nv, 0, i + 1)
    nxt = poly[nxt_idx]
    terms = poly[:, 0] * nxt[:, 1] - nxt[:, 0] * poly[:, 1]
    terms = jnp.where(i < nv, terms, 0.0)
    return jnp.abs(jnp.sum(terms)) / 2.0


def _pair_intersection_area(ca: jnp.ndarray, cb: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two convex quads given (4, 2) CCW corners."""
    poly = jnp.zeros((8, 2), dtype=ca.dtype).at[:4].set(ca)
    nv = jnp.asarray(4, jnp.int32)
    for e in range(4):
        poly, nv = _clip_halfplane(poly, nv, cb[e], cb[(e + 1) % 4])
    return jnp.where(nv >= 3, _poly_area(poly, nv), 0.0)


def pairwise_rotated_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 5) x (M, 5) rotated boxes -> (N, M) IoU matrix."""
    ca = _rotated_corners(boxes_a.astype(jnp.float32))  # (N, 4, 2)
    cb = _rotated_corners(boxes_b.astype(jnp.float32))  # (M, 4, 2)
    inter = jax.vmap(lambda a: jax.vmap(lambda b: _pair_intersection_area(a, b))(cb))(ca)
    area_a = boxes_a[:, 2] * boxes_a[:, 3]
    area_b = boxes_b[:, 2] * boxes_b[:, 3]
    union = area_a[:, None] + area_b[None] - inter
    return inter / jnp.maximum(union, 1e-9)


def rotated_nms_padded(
    boxes5: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int = 0,
):
    """Class-aware rotated NMS on fixed-size inputs (scores NEG_INF = pad).
    Returns (order, keep_sorted) like `batched_nms_padded`."""
    order = jnp.argsort(-scores)
    boxes_s = boxes5[order]
    scores_s = scores[order]
    classes_s = classes[order]
    valid = scores_s > NEG_INF / 2

    iou = pairwise_rotated_iou(boxes_s, boxes_s)
    same_class = classes_s[:, None] == classes_s[None, :]
    iou = jnp.where(same_class, iou, 0.0)

    keep = greedy_suppress(iou, valid, iou_threshold)
    if max_outputs and max_outputs > 0:
        kept_rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        keep = keep & (kept_rank < max_outputs)
    return order, keep
