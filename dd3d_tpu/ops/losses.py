"""Loss primitives: sigmoid focal, FCOS IoU-family, smooth-L1.

Rebuilds `tridet/layers/iou_loss.py`, `tridet/layers/smooth_l1_loss.py`, and
the fvcore `sigmoid_focal_loss` used in `tridet/modeling/dd3d/fcos2d.py:5`.
All functions are elementwise/jit-safe and return UNREDUCED values unless
noted; masking + normalization happen in the model-level loss code, which is
where the reference applies its cross-worker normalizers.
"""
import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray, alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """Per-element sigmoid focal loss (fvcore semantics).

    logits/targets: same shape; targets in {0, 1}.
    """
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_bce(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * ((1.0 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def optax_sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross entropy with logits (per element)."""
    # max(x, 0) - x * t + log(1 + exp(-|x|))
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def iou_loss_ltrb(pred: jnp.ndarray, target: jnp.ndarray, loc_loss_type: str = "giou") -> jnp.ndarray:
    """FCOS-style IoU losses on (l, t, r, b) distances. Per-element (N,).

    cf. tridet/layers/iou_loss.py:8-71 (same +1 smoothing on the IoU ratio).
    """
    pred_l, pred_t, pred_r, pred_b = pred[..., 0], pred[..., 1], pred[..., 2], pred[..., 3]
    tgt_l, tgt_t, tgt_r, tgt_b = target[..., 0], target[..., 1], target[..., 2], target[..., 3]

    target_area = (tgt_l + tgt_r) * (tgt_t + tgt_b)
    pred_area = (pred_l + pred_r) * (pred_t + pred_b)

    w_intersect = jnp.minimum(pred_l, tgt_l) + jnp.minimum(pred_r, tgt_r)
    h_intersect = jnp.minimum(pred_b, tgt_b) + jnp.minimum(pred_t, tgt_t)
    g_w = jnp.maximum(pred_l, tgt_l) + jnp.maximum(pred_r, tgt_r)
    g_h = jnp.maximum(pred_b, tgt_b) + jnp.maximum(pred_t, tgt_t)

    ac_union = g_w * g_h
    area_intersect = w_intersect * h_intersect
    area_union = target_area + pred_area - area_intersect

    ious = (area_intersect + 1.0) / (area_union + 1.0)
    if loc_loss_type == "iou":
        return -jnp.log(jnp.maximum(ious, 1e-12))
    if loc_loss_type == "linear_iou":
        return 1.0 - ious
    if loc_loss_type == "giou":
        gious = ious - (ac_union - area_union) / jnp.maximum(ac_union, 1e-7)
        return 1.0 - gious
    raise NotImplementedError(loc_loss_type)


def iou_loss_ltrb_t(pred: jnp.ndarray, target: jnp.ndarray, loc_loss_type: str = "giou") -> jnp.ndarray:
    """Component-major variant of `iou_loss_ltrb`: (B, 4, P) ltrb inputs,
    (B, P) output. Same math; the 4-axis sits on sublanes instead of lanes
    (see models/loss_geometry.py for the layout rationale)."""
    pred_l, pred_t, pred_r, pred_b = pred[:, 0], pred[:, 1], pred[:, 2], pred[:, 3]
    tgt_l, tgt_t, tgt_r, tgt_b = target[:, 0], target[:, 1], target[:, 2], target[:, 3]

    target_area = (tgt_l + tgt_r) * (tgt_t + tgt_b)
    pred_area = (pred_l + pred_r) * (pred_t + pred_b)

    w_intersect = jnp.minimum(pred_l, tgt_l) + jnp.minimum(pred_r, tgt_r)
    h_intersect = jnp.minimum(pred_b, tgt_b) + jnp.minimum(pred_t, tgt_t)
    g_w = jnp.maximum(pred_l, tgt_l) + jnp.maximum(pred_r, tgt_r)
    g_h = jnp.maximum(pred_b, tgt_b) + jnp.maximum(pred_t, tgt_t)

    ac_union = g_w * g_h
    area_intersect = w_intersect * h_intersect
    area_union = target_area + pred_area - area_intersect

    ious = (area_intersect + 1.0) / (area_union + 1.0)
    if loc_loss_type == "iou":
        return -jnp.log(jnp.maximum(ious, 1e-12))
    if loc_loss_type == "linear_iou":
        return 1.0 - ious
    if loc_loss_type == "giou":
        gious = ious - (ac_union - area_union) / jnp.maximum(ac_union, 1e-7)
        return 1.0 - gious
    raise NotImplementedError(loc_loss_type)


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Per-element smooth L1; beta < 1e-5 degenerates to pure L1.

    cf. tridet/layers/smooth_l1_loss.py:58-73 (fvcore variant).
    """
    diff = jnp.abs(pred - target)
    if beta < 1e-5:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
