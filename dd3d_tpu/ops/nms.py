"""Shape-static NMS for TPU.

Replaces the reference's dynamic-shape detectron2 CUDA ops:
- `batched_nms` (class-aware, axis-aligned) used in
  tridet/modeling/dd3d/fcos2d.py:346-367,
- the post-NMS top-k via `kthvalue` (same lines).

Everything here takes FIXED-size inputs with a validity encoding
(score == NEG_INF means "no box") and produces fixed-size outputs with a keep
mask, so the whole inference path stays inside one XLA program with no host
sync. Exact greedy semantics (same keep set as torchvision NMS) via a
sequential `lax.fori_loop` over score-sorted candidates with vectorized
suppression — O(N) tiny steps + one O(N^2) IoU matrix, which XLA fuses well
for the N <= few-thousand regime of detection decode.
"""
import jax
import jax.numpy as jnp

NEG_INF = -1e10


def pairwise_iou_xyxy(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) x (M, 4) xyxy boxes -> (N, M) IoU."""
    ax1, ay1, ax2, ay2 = jnp.split(boxes_a, 4, axis=-1)  # each (N, 1)
    bx1, by1, bx2, by2 = [v[:, 0] for v in jnp.split(boxes_b, 4, axis=-1)]  # each (M,)

    inter_w = jnp.maximum(0.0, jnp.minimum(ax2, bx2[None]) - jnp.maximum(ax1, bx1[None]))
    inter_h = jnp.maximum(0.0, jnp.minimum(ay2, by2[None]) - jnp.maximum(ay1, by1[None]))
    inter = inter_w * inter_h

    area_a = jnp.maximum(0.0, ax2 - ax1) * jnp.maximum(0.0, ay2 - ay1)  # (N, 1)
    area_b = jnp.maximum(0.0, bx2 - bx1) * jnp.maximum(0.0, by2 - by1)  # (M,)
    union = area_a + area_b[None] - inter
    return inter / jnp.maximum(union, 1e-9)


def greedy_suppress(iou: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float) -> jnp.ndarray:
    """Exact greedy NMS keep-mask given a score-sorted IoU matrix.

    iou: (N, N) pairwise IoU of boxes sorted by DESCENDING score.
    valid: (N,) bool; invalid boxes are never kept and never suppress.
    Returns keep: (N,) bool with identical semantics to sequential greedy NMS.

    Implementation: fixpoint self-suppression (the scheme TF's TPU NMS uses)
    instead of an N-step sequential walk — N tiny loop iterations are
    latency-bound on TPU (measured ~40% of the whole inference program at
    N=512, batch 96). Iterate
        alive_{t+1}(i) = valid(i) and not exists j<i: alive_t(j) and iou(j,i)>T
    from alive_0 = valid. Box 0 is stable immediately, and if boxes <k are
    stable after iteration t then box k is stable after t+1, so the loop
    reaches the exact greedy fixpoint in at most `longest suppression chain`
    iterations (3-6 in practice) of cheap (N, N) mask reductions.
    """
    n = iou.shape[0]
    idx = jnp.arange(n)
    # overlap[j, i]: higher-ranked j would suppress i if j survives.
    overlap = (iou > iou_threshold) & (idx[:, None] < idx[None, :])

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        alive, _ = state
        suppressed = jnp.any(overlap & alive[:, None], axis=0)
        new_alive = valid & ~suppressed
        return new_alive, jnp.any(new_alive != alive)

    alive, _ = jax.lax.while_loop(cond, body, (valid, jnp.asarray(True)))
    return alive


def batched_nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
    assume_sorted: bool = False,
):
    """Class-aware NMS on fixed-size inputs.

    boxes: (N, 4) xyxy; scores: (N,) with NEG_INF for padding; classes: (N,) int.
    Returns (order, keep_sorted):
      order: (N,) indices into the input, score-descending,
      keep_sorted: (N,) bool keep mask in that order; at most `max_outputs`
      True entries (top-scored kept boxes), mirroring the post-NMS top-k of
      tridet/modeling/dd3d/fcos2d.py:356-366.

    assume_sorted: inputs are already score-descending (e.g. straight out of
    a top-k) — skips the internal argsort (~1.4 ms at batch 128, N=512).
    """
    n = boxes.shape[0]
    if assume_sorted:
        order = jnp.arange(n)
        boxes_s, scores_s, classes_s = boxes, scores, classes
    else:
        order = jnp.argsort(-scores)
        boxes_s = boxes[order]
        scores_s = scores[order]
        classes_s = classes[order]
    valid = scores_s > NEG_INF / 2

    # Class-offset trick: shift each class to a disjoint coordinate region so
    # cross-class IoU is exactly 0 (same effect as per-class NMS).
    span = jnp.max(jnp.where(valid[:, None], boxes_s, 0.0)) + 1.0
    offset = classes_s.astype(boxes_s.dtype)[:, None] * span
    shifted = boxes_s + offset

    iou = pairwise_iou_xyxy(shifted, shifted)
    keep = greedy_suppress(iou, valid, iou_threshold)
    if max_outputs is not None and max_outputs > 0:
        # Keep only the top `max_outputs` kept boxes (score-sorted, so this is
        # a prefix count over the keep mask).
        kept_rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        keep = keep & (kept_rank < max_outputs)
    return order, keep


def topk_by_score(scores: jnp.ndarray, k: int):
    """Top-k indices by score over a fixed-size candidate set (desc order)."""
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx
