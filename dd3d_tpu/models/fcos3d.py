"""FCOS3D head, box decode, disentangled loss, and inference gather.

Rebuild of `tridet/modeling/dd3d/fcos3d.py` and
`disentangled_box3d_loss.py`:
- shared box3d conv tower with per-level norms + 5 predictor branches
  (quat 4C / proj_ctr 2C / depth 1C / size 3C / conf 1C), learnable per-level
  Scale/Offset with depth init from dataset depth statistics,
- `predictions_to_boxes3d`: camera-aware decode — depth scaled by focal
  length, allocentric->egocentric rotation, tanh size around canonical sizes,
- disentangled 8-corner loss: substitute one predicted component at a time
  into the GT box and penalize corner smooth-L1; 3D confidence trained with
  BCE against exp(-L1_err / T).

All loss math is fp32, dense over (B, P) locations with a positive mask.
"""
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dd3d_tpu.models.layers import Offset, PerLevelNorms, Scale, kaiming_normal_fan_out, kaiming_uniform_a1
from dd3d_tpu.ops.geometry import allocentric_to_egocentric, unproject_points2d
from dd3d_tpu.ops.losses import optax_sigmoid_bce, smooth_l1_loss
from dd3d_tpu.structures.boxes3d import Boxes3D

EPS = 1e-7


class FCOS3DHead(nn.Module):
    """cf. tridet/modeling/dd3d/fcos3d.py:55-188."""

    num_classes: int
    in_strides: Sequence[int]
    mean_depth_per_level: Sequence[float]
    std_depth_per_level: Sequence[float]
    num_convs: int = 4
    norm: str = "FrozenBN"
    use_scale: bool = True
    depth_scale_init_factor: float = 0.3
    proj_ctr_scale_init_factor: float = 1.0
    per_level_predictors: bool = False
    class_agnostic: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        num_levels = len(features)
        in_channels = features[0].shape[-1]
        nc = 1 if self.class_agnostic else self.num_classes

        convs = [
            nn.Conv(in_channels, (3, 3), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=kaiming_normal_fan_out, name=f"box3d_tower_conv{i}")
            for i in range(self.num_convs)
        ]
        norms = [
            PerLevelNorms(num_levels, in_channels, self.norm, dtype=self.dtype, name=f"box3d_tower_norm{i}")
            for i in range(self.num_convs)
        ]

        n_pred = num_levels if self.per_level_predictors else 1

        def predictor(out_ch, name, use_bias=True):
            return [
                nn.Conv(out_ch, (3, 3), use_bias=use_bias, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=kaiming_uniform_a1, name=f"{name}{i}")
                for i in range(n_pred)
            ]

        box3d_quat = predictor(4 * nc, "box3d_quat")
        box3d_ctr = predictor(2 * nc, "box3d_ctr")
        # depth predictor has no bias when scales are used (fcos3d.py:115-118).
        box3d_depth = predictor(1 * nc, "box3d_depth", use_bias=not self.use_scale)
        box3d_size = predictor(3 * nc, "box3d_size")
        box3d_conf = predictor(1 * nc, "box3d_conf")

        if self.use_scale:
            scales_proj_ctr = [
                Scale(float(s) * self.proj_ctr_scale_init_factor, name=f"scale_proj_ctr{l}")
                for l, s in enumerate(self.in_strides)
            ]
            scales_size = [Scale(1.0, name=f"scale_size{l}") for l in range(num_levels)]
            scales_conf = [Scale(1.0, name=f"scale_conf{l}") for l in range(num_levels)]
            scales_depth = [
                Scale(float(sigma) * self.depth_scale_init_factor, name=f"scale_depth{l}")
                for l, sigma in enumerate(self.std_depth_per_level)
            ]
            offsets_depth = [Offset(float(m), name=f"offset_depth{l}") for l, m in enumerate(self.mean_depth_per_level)]

        quat_out, ctr_out, depth_out, size_out, conf_out = [], [], [], [], []
        for l, feat in enumerate(features):
            x = feat
            for conv, norm in zip(convs, norms):
                x = nn.relu(norm(conv(x), l, train))
            p = l if self.per_level_predictors else 0
            quat = box3d_quat[p](x)
            ctr = box3d_ctr[p](x)
            depth = box3d_depth[p](x)
            size3d = box3d_size[p](x)
            conf3d = box3d_conf[p](x)
            if self.use_scale:
                ctr = scales_proj_ctr[l](ctr)
                size3d = scales_size[l](size3d)
                conf3d = scales_conf[l](conf3d)
                depth = offsets_depth[l](scales_depth[l](depth))
            quat_out.append(quat)
            ctr_out.append(ctr)
            depth_out.append(depth)
            size_out.append(size3d)
            conf_out.append(conf3d)
        return quat_out, ctr_out, depth_out, size_out, conf_out


def predictions_to_boxes3d(
    quat: jnp.ndarray,  # (..., 4)
    proj_ctr: jnp.ndarray,  # (..., 2) offsets
    depth: jnp.ndarray,  # (...,)
    size: jnp.ndarray,  # (..., 3)
    locations: jnp.ndarray,  # (..., 2)
    inv_intrinsics: jnp.ndarray,  # (..., 3, 3)
    canon_box_sizes: jnp.ndarray,  # (..., 3)
    min_depth: float,
    max_depth: float,
    scale_depth_by_focal_lengths_factor: float = 500.0,
    scale_depth_by_focal_lengths: bool = True,
    quat_is_allocentric: bool = True,
    depth_is_distance: bool = False,
) -> Boxes3D:
    """Decode raw head outputs into camera-frame 3D boxes.
    cf. tridet/modeling/dd3d/fcos3d.py:16-52."""
    quat = quat.astype(jnp.float32)
    proj_ctr = proj_ctr.astype(jnp.float32)
    depth = depth.astype(jnp.float32)
    size = size.astype(jnp.float32)

    quat = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), EPS)
    quat = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), EPS)

    if scale_depth_by_focal_lengths:
        # pixel_size = ||(1/fx, 1/fy)||; depth /= pixel_size * factor
        # (fcos3d.py:35-38) — the camera-awareness mechanism.
        pixel_size = jnp.sqrt(
            inv_intrinsics[..., 0, 0] ** 2 + inv_intrinsics[..., 1, 1] ** 2
        )
        depth = depth / jnp.maximum(pixel_size * scale_depth_by_focal_lengths_factor, EPS)

    if depth_is_distance:
        ray_norm = jnp.linalg.norm(unproject_points2d(locations, inv_intrinsics), axis=-1)
        depth = depth / jnp.maximum(ray_norm, EPS)

    depth = jnp.clip(depth, min_depth, max_depth)[..., None]

    proj_ctr = proj_ctr + locations

    if quat_is_allocentric:
        quat = allocentric_to_egocentric(quat, proj_ctr, inv_intrinsics)

    size = (jnp.tanh(size) + 1.0) * canon_box_sizes  # max size = 2x canonical

    return Boxes3D(quat, proj_ctr, depth, size, inv_intrinsics)


def disentangled_box3d_loss(
    pred: Boxes3D,
    target: Boxes3D,
    weights: jnp.ndarray,  # (B, P) centerness targets (already pos-masked)
    pos_mask: jnp.ndarray,  # (B, P) float
    loss_denom: jnp.ndarray,
    smooth_l1_beta: float = 0.05,
    max_loss_per_group: float = 20.0,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Disentangled 8-corner loss over dense masked locations.
    cf. tridet/modeling/dd3d/disentangled_box3d_loss.py:26-54.

    (NOTE: the reference computes `loss.clamp(max=...)` without assignment —
    a no-op; we intentionally reproduce that behavior, keeping the unclamped
    loss, and keep `max_loss_per_group` in the signature for config parity.)
    """
    del max_loss_per_group
    target_corners = target.corners  # (B, P, 8, 3) fp32

    losses = {}
    for key in ("quat", "proj_ctr", "depth", "size"):
        sub = target.replace(**{key: getattr(pred, key)})
        pred_corners = sub.corners
        elem = smooth_l1_loss(pred_corners, target_corners, smooth_l1_beta)  # (B, P, 8, 3)
        per_loc = jnp.mean(elem.reshape(elem.shape[:-2] + (24,)), axis=-1)  # (B, P)
        losses[f"loss_box3d_{key}"] = jnp.sum(per_loc * weights * pos_mask) / loss_denom

    entangled_l1 = jnp.mean(
        jnp.abs(target_corners - jax.lax.stop_gradient(pred.corners)).reshape(target_corners.shape[:-2] + (24,)),
        axis=-1,
    )
    return losses, entangled_l1


def gather_per_class(pred_flat: jnp.ndarray, labels: jnp.ndarray, comp_dim: int, num_classes: int) -> jnp.ndarray:
    """(B, P, comp_dim * C) -> (B, P, comp_dim) selecting each location's class.

    Mirrors the torch.gather class selection in fcos3d.py:258-263, expressed
    as a one-hot contraction: a last-axis `take_along_axis` with per-location
    indices lowers to a serialized scalar-core gather on TPU (the same
    pattern cost 25 ms/level in the decode path), while the contraction is a
    dense VPU/MXU op.
    """
    b, p, _ = pred_flat.shape
    r = pred_flat.reshape(b, p, comp_dim, num_classes)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=r.dtype)  # (B, P, C)
    # multiply-reduce, NOT einsum: a dot_general at default TPU matmul
    # precision truncates fp32 operands to bf16 (0.4% value error); the
    # broadcast-multiply VPU reduce is exact and just as fast at this size.
    return jnp.sum(r * onehot[:, :, None, :], axis=-1)


def fcos3d_loss(
    quat_flat: jnp.ndarray,  # (B, P, 4C) fp32
    ctr_flat: jnp.ndarray,  # (B, P, 2C)
    depth_flat: jnp.ndarray,  # (B, P, C)
    size_flat: jnp.ndarray,  # (B, P, 3C)
    conf_flat: jnp.ndarray,  # (B, P, C)
    targets: Dict[str, jnp.ndarray],
    fcos2d_info: Dict[str, jnp.ndarray],
    inv_intrinsics: jnp.ndarray,  # (B, 3, 3)
    locations: jnp.ndarray,  # (P, 2)
    canon_box_sizes: jnp.ndarray,  # (num_classes, 3)
    cfg3d,
) -> Dict[str, jnp.ndarray]:
    """Dense masked FCOS3D loss. cf. tridet/modeling/dd3d/fcos3d.py:209-299."""
    num_classes = conf_flat.shape[-1] if not cfg3d.CLASS_AGNOSTIC_BOX3D else 1
    labels = targets["labels"]
    pos = targets["pos_mask"].astype(jnp.float32)
    labels_safe = jnp.where(targets["pos_mask"], labels, 0)

    if cfg3d.CLASS_AGNOSTIC_BOX3D:
        quat_p, ctr_p = quat_flat, ctr_flat
        depth_p, size_p, conf_p = depth_flat[..., 0], size_flat, conf_flat[..., 0]
    else:
        quat_p = gather_per_class(quat_flat, labels_safe, 4, num_classes)
        ctr_p = gather_per_class(ctr_flat, labels_safe, 2, num_classes)
        depth_p = gather_per_class(depth_flat, labels_safe, 1, num_classes)[..., 0]
        size_p = gather_per_class(size_flat, labels_safe, 3, num_classes)
        conf_p = gather_per_class(conf_flat, labels_safe, 1, num_classes)[..., 0]

    # One-hot contraction for the canonical-size table lookup (same scalar-
    # core-gather avoidance as gather_per_class above).
    canon_oh = jax.nn.one_hot(labels_safe, canon_box_sizes.shape[0], dtype=jnp.float32)
    canon = jnp.sum(
        canon_oh[..., None] * canon_box_sizes.astype(jnp.float32)[None, None], axis=-2
    )  # (B, P, 3) — exact multiply-reduce (see gather_per_class)
    b, p = labels.shape
    loc = jnp.broadcast_to(locations[None], (b, p, 2))
    inv_k = jnp.broadcast_to(inv_intrinsics[:, None], (b, p, 3, 3))

    pred_boxes = predictions_to_boxes3d(
        quat_p, ctr_p, depth_p, size_p, loc, inv_k, canon,
        cfg3d.MIN_DEPTH, cfg3d.MAX_DEPTH,
        scale_depth_by_focal_lengths_factor=cfg3d.SCALE_DEPTH_BY_FOCAL_LENGTHS_FACTOR,
        scale_depth_by_focal_lengths=cfg3d.SCALE_DEPTH_BY_FOCAL_LENGTHS,
        quat_is_allocentric=cfg3d.PREDICT_ALLOCENTRIC_ROT,
        depth_is_distance=cfg3d.PREDICT_DISTANCE,
    )

    tgt_vec = targets["box3d_targets"]  # (B, P, 10): quat, proj_ctr, depth, size
    target_boxes = Boxes3D(
        quat=tgt_vec[..., 0:4],
        proj_ctr=tgt_vec[..., 4:6],
        depth=tgt_vec[..., 6:7],
        size=tgt_vec[..., 7:10],
        inv_intrinsics=inv_k,
    )

    weights = fcos2d_info["centerness_targets"]
    loss_denom = fcos2d_info["loss_denom"]

    losses_box3d, l1_err = disentangled_box3d_loss(
        pred_boxes, target_boxes, weights, pos, loss_denom,
        smooth_l1_beta=cfg3d.LOSS.SMOOTH_L1_BETA,
        max_loss_per_group=cfg3d.LOSS.MAX_LOSS_PER_GROUP_DISENT,
    )
    w3d = cfg3d.LOSS.WEIGHT_BOX3D
    losses = {k: w3d * v for k, v in losses_box3d.items()}

    conf_target = jnp.exp(-l1_err / cfg3d.LOSS.CONF_3D_TEMPERATURE)
    conf_bce = optax_sigmoid_bce(conf_p, jax.lax.stop_gradient(conf_target))
    losses["loss_conf3d"] = cfg3d.LOSS.WEIGHT_CONF3D * jnp.sum(conf_bce * weights * pos) / loss_denom
    return losses


def decode_fcos3d_candidates(
    quat: jnp.ndarray,  # (B, H, W, 4C)
    ctr: jnp.ndarray,  # (B, H, W, 2C)
    depth: jnp.ndarray,  # (B, H, W, C)
    size: jnp.ndarray,  # (B, H, W, 3C)
    conf: jnp.ndarray,  # (B, H, W, C)
    cand: Dict[str, jnp.ndarray],  # output of decode_fcos2d_level
    inv_intrinsics: jnp.ndarray,  # (B, 3, 3)
    canon_box_sizes: jnp.ndarray,  # (>= num_classes, 3)
    cfg3d,
    num_classes: int,
    class_agnostic: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Gather 3D outputs at the 2D candidates and decode to Boxes3D fields.
    cf. tridet/modeling/dd3d/fcos3d.py:302-399 (without the python loops).

    Perf note: all five branches are gathered with ONE contiguous row-gather
    over the concatenated channel dim (in the compute dtype), then cast and
    class-gathered on the small (B, K, ...) result. Per-branch gathers over
    the full (B, H*W, comp, C) maps lowered to slow general gathers on TPU
    (~25 ms/batch of the decode path); this form is near-free.
    """
    b, h, w, _ = conf.shape
    nc = 1 if class_agnostic else num_classes
    k = cand["loc_idx"].shape[1]

    comps = [(quat, 4), (ctr, 2), (depth, 1), (size, 3), (conf, 1)]
    total = sum(c * nc for _, c in comps)
    stacked = jnp.concatenate([x.reshape(b, h * w, c * nc) for x, c in comps], axis=-1)
    # Index shape (B, K, 1), NOT pre-broadcast to (B, K, total): with the
    # trailing dim broadcast XLA emits a whole-row gather (slice size = total)
    # instead of B*K*total independent scalar lookups, which the TPU scalar
    # core serializes (measured 25 ms/level at batch 96 for the broadcast
    # form vs noise for the row form).
    rows = jnp.take_along_axis(stacked, cand["loc_idx"][..., None], axis=1).astype(jnp.float32)  # (B, K, total)

    # Class selection via one-hot multiply-reduce, not take_along_axis
    # (scalar-core lookups) and not einsum (dot_general truncates fp32 to
    # bf16 at default TPU matmul precision): the broadcast multiply + sum
    # is a vectorized, EXACT VPU reduce over the tiny class dim.
    onehot = None if class_agnostic else jax.nn.one_hot(cand["cls"], nc, dtype=rows.dtype)
    parts = []
    off = 0
    for _, c in comps:
        part = rows[..., off : off + c * nc].reshape(b, k, c, nc)
        if class_agnostic:
            part = part[..., 0]
        else:
            part = jnp.sum(part * onehot[:, :, None, :], axis=-1)
        parts.append(part)
        off += c * nc

    quat_k, ctr_k, depth_k, size_k, conf_k = parts
    depth_k = depth_k[..., 0]
    conf_k = jax.nn.sigmoid(conf_k[..., 0])

    cls_safe = jnp.where(cand["valid"], cand["cls"], 0)
    canon = jnp.sum(
        jax.nn.one_hot(cls_safe, canon_box_sizes.shape[0], dtype=jnp.float32)[..., None]
        * canon_box_sizes[None, None], axis=-2,
    )
    inv_k = jnp.broadcast_to(inv_intrinsics[:, None], (b, k, 3, 3))

    boxes3d = predictions_to_boxes3d(
        quat_k, ctr_k, depth_k, size_k, cand["locations"], inv_k, canon,
        cfg3d.MIN_DEPTH, cfg3d.MAX_DEPTH,
        scale_depth_by_focal_lengths_factor=cfg3d.SCALE_DEPTH_BY_FOCAL_LENGTHS_FACTOR,
        scale_depth_by_focal_lengths=cfg3d.SCALE_DEPTH_BY_FOCAL_LENGTHS,
        quat_is_allocentric=cfg3d.PREDICT_ALLOCENTRIC_ROT,
        depth_is_distance=cfg3d.PREDICT_DISTANCE,
    )
    # scores_3d = 2D score x 3D confidence (fcos3d.py:375-376).
    scores_3d = jnp.where(cand["valid"], jnp.maximum(cand["score"], 0.0) * conf_k, cand["score"])
    return {
        "boxes3d_quat": boxes3d.quat,
        "boxes3d_proj_ctr": boxes3d.proj_ctr,
        "boxes3d_depth": boxes3d.depth,
        "boxes3d_size": boxes3d.size,
        "conf3d": conf_k,
        "score_3d": scores_3d,
    }
