"""Vectorized FCOS target assignment (TPU-native).

Rebuild of `tridet/modeling/dd3d/prepare_targets.py` (DD3DTargetPreparer):
the reference's per-image Python loop (prepare_targets.py:105-171) becomes a
single masked (B, P, G) computation over padded GT, where P = total number of
feature locations across levels and G = MAX_GT_PER_IMAGE.

Semantics preserved:
- center sampling with radius x stride clamped to the GT box
  (get_sample_region, prepare_targets.py:179-212),
- per-level size-of-interest gating on max(l, t, r, b) (prepare_targets.py:19-26,143-147),
- min-area tie-break; unmatched locations get label == num_classes
  (prepare_targets.py:149-162).

GT 3D boxes are carried as 10-D vectors in the DECODE parameterization
[quat(4, egocentric wxyz), proj_ctr(2), depth(1), size(3 wlh)] so the loss
can substitute predicted components directly.
"""
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from dd3d_tpu.ops.locations import compute_feature_locations

INF = 1e8


def build_location_bases(
    feature_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    sizes_of_interest: Sequence[int],
    offset: str = "none",
):
    """Static per-location metadata: locations (P, 2), strides (P,),
    size ranges (P, 2), level ids (P,). Computed once per input shape."""
    locs, strs, ranges, lvls = [], [], [], []
    soi_edges = [-1] + list(sizes_of_interest) + [INF]
    for l, ((h, w), s) in enumerate(zip(feature_shapes, strides)):
        n = h * w
        locs.append(compute_feature_locations(h, w, s, offset))
        strs.append(jnp.full((n,), s, dtype=jnp.float32))
        lo, hi = soi_edges[l], soi_edges[l + 1]
        ranges.append(jnp.broadcast_to(jnp.asarray([lo, hi], dtype=jnp.float32), (n, 2)))
        lvls.append(jnp.full((n,), l, dtype=jnp.int32))
    return (
        jnp.concatenate(locs, 0),
        jnp.concatenate(strs, 0),
        jnp.concatenate(ranges, 0),
        jnp.concatenate(lvls, 0),
    )


def prepare_targets(
    locations: jnp.ndarray,  # (P, 2)
    loc_strides: jnp.ndarray,  # (P,)
    loc_size_ranges: jnp.ndarray,  # (P, 2)
    gt_boxes2d: jnp.ndarray,  # (B, G, 4) xyxy
    gt_classes: jnp.ndarray,  # (B, G) int32
    gt_boxes3d: jnp.ndarray,  # (B, G, 10) decode-parameterized
    gt_valid: jnp.ndarray,  # (B, G) bool
    num_classes: int,
    center_sample: bool = True,
    pos_radius: float = 1.5,
) -> Dict[str, jnp.ndarray]:
    # LAYOUT: every (B, ., .) intermediate is (B, G, P) with the large P axis
    # minor. TPU tiles the two minor axes to (8 sublanes, 128 lanes); the
    # previous (B, P, G[, 4]) forms padded G=24 -> 128 lanes (5x) and the
    # trailing 4 -> 128 (32x), inflating HBM traffic ~25x on every pass.
    # P pads 10230 -> 10240 (free) and G sits on sublanes.
    xs = locations[:, 0][None, None, :]  # (1, 1, P)
    ys = locations[:, 1][None, None, :]

    x1 = gt_boxes2d[..., 0][:, :, None]  # (B, G, 1)
    y1 = gt_boxes2d[..., 1][:, :, None]
    x2 = gt_boxes2d[..., 2][:, :, None]
    y2 = gt_boxes2d[..., 3][:, :, None]

    l = xs - x1  # (B, G, P)
    t = ys - y1
    r = x2 - xs
    b = y2 - ys

    if center_sample:
        # Clamp a radius*stride window around the GT center to the box, then
        # require the location inside that window (prepare_targets.py:179-212).
        cx = (x1 + x2) * 0.5
        cy = (y1 + y2) * 0.5
        rad = (loc_strides * pos_radius)[None, None, :]  # (1, 1, P)
        gx1 = jnp.maximum(cx - rad, x1)
        gy1 = jnp.maximum(cy - rad, y1)
        gx2 = jnp.minimum(cx + rad, x2)
        gy2 = jnp.minimum(cy + rad, y2)
        inside = (
            (xs - gx1 > 0) & (gy2 - ys > 0) & (gx2 - xs > 0) & (ys - gy1 > 0)
        )
    else:
        inside = jnp.minimum(jnp.minimum(l, t), jnp.minimum(r, b)) > 0

    max_ltrb = jnp.maximum(jnp.maximum(l, t), jnp.maximum(r, b))  # (B, G, P)
    cared = (max_ltrb >= loc_size_ranges[None, None, :, 0]) & (max_ltrb <= loc_size_ranges[None, None, :, 1])

    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (B, G, 1)
    cost = jnp.where(inside & cared & gt_valid[:, :, None], area, INF)  # (B, G, P)

    min_area = jnp.min(cost, axis=1)  # (B, P)
    matched = jnp.argmin(cost, axis=1)  # (B, P), first-min tie-break

    pos_mask = min_area < INF

    # All matched-GT lookups as one-hot contractions over the (small) G axis:
    # per-(b, p) take_along_axis gathers serialize on the TPU scalar core,
    # while these are dense multiply-reduce ops on the VPU.
    num_gt = gt_valid.shape[1]
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (1, num_gt, 1), 1)
    onehot_g = (matched[:, None, :] == iota_g).astype(jnp.float32)  # (B, G, P)

    # multiply-reduce, not einsum: dot_general at default TPU matmul
    # precision truncates fp32 operands to bf16, quantizing the regression
    # targets (ltrb up to ~2000 px has a bf16 step of 8 px).
    labels = jnp.sum(onehot_g * gt_classes.astype(jnp.float32)[:, :, None], axis=1).astype(jnp.int32)
    labels = jnp.where(pos_mask, labels, num_classes)

    def select(comp):  # (B, G, P) -> (B, P)
        return jnp.sum(onehot_g * comp, axis=1)

    # Outputs stay component-major (comp on sublanes, P on lanes):
    # box2d_reg_targets (B, 4, P), box3d_targets (B, 10, P).
    box2d_reg = jnp.stack([select(l), select(t), select(r), select(b)], axis=1)
    box2d_reg = jnp.where(pos_mask[:, None, :], box2d_reg, 0.0)

    box3d = jnp.stack(
        [select(gt_boxes3d[:, :, k][:, :, None]) for k in range(gt_boxes3d.shape[-1])], axis=1
    )  # (B, 10, P)
    # Neutral padding for negatives: identity quat keeps corner math finite.
    neutral = jnp.asarray([1.0, 0, 0, 0, 0, 0, 1.0, 1.0, 1.0, 1.0], dtype=jnp.float32)
    box3d = jnp.where(pos_mask[:, None, :], box3d, neutral[None, :, None])

    return {
        "labels": labels.astype(jnp.int32),
        "box2d_reg_targets": box2d_reg,
        "box3d_targets": box3d,
        "pos_mask": pos_mask,
        "target_inds": jnp.where(pos_mask, matched, -1),
    }
