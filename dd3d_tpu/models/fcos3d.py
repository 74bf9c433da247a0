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

from dd3d_tpu.models.layers import (
    FoldableConv,
    Offset,
    PerLevelNorms,
    PredictorConv,
    Scale,
    fused_predictor_apply,
    kaiming_normal_fan_out,
    kaiming_uniform_a1,
)
from dd3d_tpu.models.level_pack import (
    head_groups,
    make_pack_plan,
    pack_levels,
    packed_tower_layer,
    unpack_levels,
)
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
    # Pack P4..P7 into one guard-banded canvas (see level_pack.py and the
    # FCOS2DHead docstring; pack_train covers the training graph).
    pack_eval: bool = False
    pack_train: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        num_levels = len(features)
        in_channels = features[0].shape[-1]
        nc = 1 if self.class_agnostic else self.num_classes

        convs = [
            FoldableConv(in_channels, kernel_size=3, use_bias=False, dtype=self.dtype,
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
                PredictorConv(out_ch, in_channels, use_bias=use_bias, dtype=self.dtype,
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

        def apply_predictors(x, l):
            p = l if self.per_level_predictors else 0
            # All five predictors read the same tower output: one concat-conv
            # + channel split instead of five full activation reads (exact —
            # see layers.fused_predictor_apply; cf. fcos3d.py:158-171).
            quat, ctr, depth, size3d, conf3d = fused_predictor_apply(
                x, [box3d_quat[p], box3d_ctr[p], box3d_depth[p], box3d_size[p], box3d_conf[p]],
                self.dtype,
            )
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

        pack = self.pack_train if train else self.pack_eval
        quat_out, ctr_out, depth_out, size_out, conf_out = [], [], [], [], []
        for group in head_groups(features, pack):
            if len(group) == 1:
                l = group[0]
                x = features[l]
                for conv, norm in zip(convs, norms):
                    # Per-level FrozenBN folds into this level's application
                    # of the shared tower conv (kernel*mul is re-derived per
                    # level; the weight-sized multiply is negligible next to
                    # the conv).
                    fold = norm(None, l, train, fold_query=True)
                    x = nn.relu(conv(x, *fold) if fold is not None else norm(conv(x), l, train))
                apply_predictors(x, l)
                continue

            # Packed group: one conv per tower layer over a guard-banded
            # canvas; per-level norms as per-pixel affine maps (train-mode
            # live BN stats come from canvas slices — see level_pack.py).
            # Shared predictors run packed too; per-level predictors /
            # Scales apply after unpacking.
            plan = make_pack_plan([features[l].shape[1:3] for l in group])
            x = pack_levels([features[l] for l in group], plan)
            for conv, norm in zip(convs, norms):
                x = packed_tower_layer(x, conv, norm, plan, group, in_channels,
                                       self.dtype, train)
            if self.per_level_predictors:
                for i, xl in enumerate(unpack_levels(x, plan)):
                    apply_predictors(xl, group[i])
            else:
                packs = fused_predictor_apply(
                    x, [box3d_quat[0], box3d_ctr[0], box3d_depth[0], box3d_size[0], box3d_conf[0]],
                    self.dtype,
                )
                unpacked = [unpack_levels(p, plan) for p in packs]
                for i, l in enumerate(group):
                    quat, ctr, depth, size3d, conf3d = (u[i] for u in unpacked)
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


def gather_per_class_t(pred_flat: jnp.ndarray, onehot_c: jnp.ndarray, comp_dim: int, num_classes: int) -> jnp.ndarray:
    """(B, comp_dim * C, P) -> (B, comp_dim, P) selecting each location's class.

    Mirrors the torch.gather class selection in fcos3d.py:258-263, expressed
    as a one-hot contraction in the component-major P-minor layout (see
    loss_geometry.py): a last-axis `take_along_axis` with per-location
    indices lowers to a serialized scalar-core gather on TPU, while the
    contraction is a dense VPU multiply-reduce (exact in fp32 — no
    dot_general bf16 truncation). Channel order is [comp, class] row-major
    (the reference's reshape(-1, comp, C)).
    """
    out = []
    for k in range(comp_dim):
        blk = pred_flat[:, k * num_classes:(k + 1) * num_classes, :]  # (B, C, P)
        out.append(jnp.sum(blk * onehot_c, axis=1))
    return jnp.stack(out, axis=1)  # (B, comp, P)


def fcos3d_loss(
    quat_flat: jnp.ndarray,  # (B, 4C, P) fp32 — component-major, P minor
    ctr_flat: jnp.ndarray,  # (B, 2C, P)
    depth_flat: jnp.ndarray,  # (B, C, P)
    size_flat: jnp.ndarray,  # (B, 3C, P)
    conf_flat: jnp.ndarray,  # (B, C, P)
    targets: Dict[str, jnp.ndarray],
    fcos2d_info: Dict[str, jnp.ndarray],
    inv_intrinsics: jnp.ndarray,  # (B, 3, 3)
    locations: jnp.ndarray,  # (P, 2)
    canon_box_sizes: jnp.ndarray,  # (num_classes, 3)
    cfg3d,
) -> Dict[str, jnp.ndarray]:
    """Dense masked FCOS3D loss. cf. tridet/modeling/dd3d/fcos3d.py:209-299.

    All maps are component-major with the large P axis minor (see
    loss_geometry.py) — the (B, P, comp[, C]) forms padded their tiny minor
    axes to 128 lanes and cost 51 ms of a 169 ms batch-16 train step.
    Includes the reference's no-op `loss.clamp(max=...)`
    (disentangled_box3d_loss.py:43): the loss is intentionally unclamped;
    MAX_LOSS_PER_GROUP_DISENT is accepted for config parity only.
    """
    from dd3d_tpu.models.loss_geometry import (
        allocentric_to_egocentric_t,
        corners_t,
        normalize_rows,
    )

    num_classes = conf_flat.shape[1] if not cfg3d.CLASS_AGNOSTIC_BOX3D else 1
    labels = targets["labels"]
    pos = targets["pos_mask"].astype(jnp.float32)
    labels_safe = jnp.where(targets["pos_mask"], labels, 0)

    canon_tbl = canon_box_sizes.astype(jnp.float32)
    iota_canon = jax.lax.broadcasted_iota(jnp.int32, (1, canon_tbl.shape[0], 1), 1)
    onehot_canon = (labels_safe[:, None, :] == iota_canon).astype(jnp.float32)  # (B, K, P)

    if cfg3d.CLASS_AGNOSTIC_BOX3D:
        quat_p, ctr_p = quat_flat, ctr_flat
        depth_p, size_p, conf_p = depth_flat[:, 0], size_flat, conf_flat[:, 0]
    else:
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, num_classes, 1), 1)
        onehot_c = (labels_safe[:, None, :] == iota_c).astype(jnp.float32)  # (B, C, P)
        quat_p = gather_per_class_t(quat_flat, onehot_c, 4, num_classes)
        ctr_p = gather_per_class_t(ctr_flat, onehot_c, 2, num_classes)
        depth_p = gather_per_class_t(depth_flat, onehot_c, 1, num_classes)[:, 0]
        size_p = gather_per_class_t(size_flat, onehot_c, 3, num_classes)
        conf_p = gather_per_class_t(conf_flat, onehot_c, 1, num_classes)[:, 0]

    # Canonical-size table lookup as the same exact one-hot contraction
    # (indexed by the true class label even in class-agnostic mode,
    # fcos3d.py:271).
    canon = jnp.stack(
        [jnp.sum(onehot_canon * canon_tbl[None, :, j, None], axis=1) for j in range(3)], axis=1
    )  # (B, 3, P)

    # --- predictions_to_boxes3d, component-major (fcos3d.py:16-52) ---
    quat_p = normalize_rows(quat_p, axis=1)
    depth_d = depth_p
    if cfg3d.SCALE_DEPTH_BY_FOCAL_LENGTHS:
        pixel_size = jnp.sqrt(
            inv_intrinsics[:, 0, 0] ** 2 + inv_intrinsics[:, 1, 1] ** 2
        )[:, None]  # (B, 1)
        depth_d = depth_d / (pixel_size * cfg3d.SCALE_DEPTH_BY_FOCAL_LENGTHS_FACTOR)
    if cfg3d.PREDICT_DISTANCE:
        from dd3d_tpu.models.loss_geometry import unproject_t

        loc_bp = jnp.broadcast_to(locations.T[None], (labels.shape[0], 2, labels.shape[1]))
        ray = unproject_t(loc_bp, inv_intrinsics)
        depth_d = depth_d / jnp.maximum(jnp.sqrt(jnp.sum(ray * ray, axis=1)), EPS)
    depth_d = jnp.clip(depth_d, cfg3d.MIN_DEPTH, cfg3d.MAX_DEPTH)
    ctr_d = ctr_p + locations.T[None]  # (B, 2, P)
    if cfg3d.PREDICT_ALLOCENTRIC_ROT:
        quat_d = allocentric_to_egocentric_t(quat_p, ctr_d, inv_intrinsics)
    else:
        quat_d = quat_p
    size_d = (jnp.tanh(size_p) + 1.0) * canon  # (B, 3, P)

    # --- disentangled 8-corner loss (disentangled_box3d_loss.py:26-54) ---
    tq = targets["box3d_targets"][:, 0:4]  # (B, 4, P) egocentric GT quat
    tc = targets["box3d_targets"][:, 4:6]
    td = targets["box3d_targets"][:, 6]
    ts = targets["box3d_targets"][:, 7:10]

    target_corners = corners_t(tq, tc, td, ts, inv_intrinsics)  # (B, 24, P)

    weights = fcos2d_info["centerness_targets"]
    loss_denom = fcos2d_info["loss_denom"]
    w3d = cfg3d.LOSS.WEIGHT_BOX3D
    beta = cfg3d.LOSS.SMOOTH_L1_BETA

    losses = {}
    subs = {
        "quat": (quat_d, tc, td, ts),
        "proj_ctr": (tq, ctr_d, td, ts),
        "depth": (tq, tc, depth_d, ts),
        "size": (tq, tc, td, size_d),
    }
    for key, (q, c, d, s) in subs.items():
        pred_corners = corners_t(q, c, d, s, inv_intrinsics)
        elem = smooth_l1_loss(pred_corners, target_corners, beta)  # (B, 24, P)
        per_loc = jnp.mean(elem, axis=1)  # (B, P)
        losses[f"loss_box3d_{key}"] = w3d * jnp.sum(per_loc * weights * pos) / loss_denom

    pred_corners_full = corners_t(quat_d, ctr_d, depth_d, size_d, inv_intrinsics)
    l1_err = jnp.mean(jnp.abs(target_corners - jax.lax.stop_gradient(pred_corners_full)), axis=1)

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
