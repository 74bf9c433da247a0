"""FCOS2D head, loss, and shape-static inference decode.

Rebuild of `tridet/modeling/dd3d/fcos2d.py`:
- `FCOS2DHead` (v2): shared cls/box2d conv towers with PER-LEVEL batch norms
  (the reference's `ModuleListDial`), predictors for class logits / ltrb box
  regression (relu'd) / centerness, learnable per-level `Scale` on box reg.
- `fcos2d_loss`: sigmoid focal (cls) + centerness-weighted gIoU (box) + BCE
  (centerness), with the reference's cross-worker normalizers expressed as
  GLOBAL-batch sums (a jitted global-batch reduction on a TPU mesh is exactly
  the reference's `reduce_sum` all-reduce, fcos2d.py:186-189,220-227).
- `decode_fcos2d_level`: fixed-size top-k candidate selection per level,
  replacing the dynamic nonzero/topk python loop (fcos2d.py:283-337).

Loss math runs in fp32 over DENSE (B, P) location arrays with masks — no
dynamic gathers; the masked-dense form is the TPU-native equivalent of the
reference's `pos_inds` indexing.
"""
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dd3d_tpu.models.layers import (
    FoldableConv,
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
from dd3d_tpu.ops.losses import iou_loss_ltrb_t, optax_sigmoid_bce, sigmoid_focal_loss
from dd3d_tpu.ops.nms import NEG_INF


def compute_ctrness_targets(reg_targets: jnp.ndarray) -> jnp.ndarray:
    """sqrt((min_lr / max_lr) * (min_tb / max_tb)); safe at empty boxes.
    cf. tridet/modeling/dd3d/fcos2d.py:20-27."""
    lr = reg_targets[..., jnp.asarray([0, 2])]
    tb = reg_targets[..., jnp.asarray([1, 3])]
    lr_ratio = jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-9)
    tb_ratio = jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-9)
    return jnp.sqrt(jnp.maximum(lr_ratio * tb_ratio, 0.0))


def compute_ctrness_targets_t(reg_t: jnp.ndarray) -> jnp.ndarray:
    """Component-major variant: (B, 4, P) ltrb -> (B, P)."""
    l, t, r, b = reg_t[:, 0], reg_t[:, 1], reg_t[:, 2], reg_t[:, 3]
    lr_ratio = jnp.minimum(l, r) / jnp.maximum(jnp.maximum(l, r), 1e-9)
    tb_ratio = jnp.minimum(t, b) / jnp.maximum(jnp.maximum(t, b), 1e-9)
    return jnp.sqrt(jnp.maximum(lr_ratio * tb_ratio, 0.0))


class FCOS2DHead(nn.Module):
    """Shared towers + predictors applied to each FPN level.

    Returns per-level dicts of NHWC outputs plus the cls-tower features
    (consumed by the nuScenes attribute/speed heads,
    tridet/modeling/dd3d/nuscenes_dd3d.py:371-374).
    """

    num_classes: int
    in_strides: Sequence[int]
    num_cls_convs: int = 4
    num_box_convs: int = 4
    norm: str = "BN"
    use_scale: bool = True
    box2d_scale_init_factor: float = 1.0
    # "v2" (default): conv(no bias) -> per-level norm -> relu (d2 Conv2d
    # fusion, fcos2d.py:73-95); "v1": plain conv WITH bias -> per-level BN ->
    # relu (fcos2d.py:60-72). Same math when the norm absorbs the bias; kept
    # for config parity with DD3D.FCOS2D._VERSION.
    version: str = "v2"
    # Pack P4..P7 into one guard-banded canvas so each shared tower layer is
    # ONE conv call instead of four tiny ones (see level_pack.py; exact —
    # tests/test_level_pack.py pins equality vs the per-level path).
    # pack_train additionally packs the TRAINING graph: live per-level BN
    # batch statistics are computed from the canvas slices (same values),
    # and the conv backward collapses 4 small dW GEMMs into one.
    pack_eval: bool = False
    pack_train: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False):
        num_levels = len(features)
        in_channels = features[0].shape[-1]
        tower_bias = self.version == "v1"

        cls_convs = [
            FoldableConv(in_channels, kernel_size=3, use_bias=tower_bias, dtype=self.dtype,
                         kernel_init=kaiming_normal_fan_out, name=f"cls_tower_conv{i}")
            for i in range(self.num_cls_convs)
        ]
        cls_norms = [
            PerLevelNorms(num_levels, in_channels, self.norm, dtype=self.dtype, name=f"cls_tower_norm{i}")
            for i in range(self.num_cls_convs)
        ]
        box_convs = [
            FoldableConv(in_channels, kernel_size=3, use_bias=tower_bias, dtype=self.dtype,
                         kernel_init=kaiming_normal_fan_out, name=f"box2d_tower_conv{i}")
            for i in range(self.num_box_convs)
        ]
        box_norms = [
            PerLevelNorms(num_levels, in_channels, self.norm, dtype=self.dtype, name=f"box2d_tower_norm{i}")
            for i in range(self.num_box_convs)
        ]
        cls_logits = PredictorConv(self.num_classes, in_channels, dtype=self.dtype,
                                   kernel_init=kaiming_uniform_a1, name="cls_logits")
        box2d_reg = PredictorConv(4, in_channels, dtype=self.dtype,
                                  kernel_init=kaiming_uniform_a1, name="box2d_reg")
        centerness = PredictorConv(1, in_channels, dtype=self.dtype,
                                   kernel_init=kaiming_uniform_a1, name="centerness")

        def box_predictors(x_box):
            # box2d_reg + centerness both read the box tower output: one
            # concat-conv + split instead of two full activation reads
            # (exact — layers.fused_predictor_apply; cf. fcos2d.py:141-151).
            return fused_predictor_apply(x_box, [box2d_reg, centerness], self.dtype)
        scales = (
            [Scale(init_value=float(s) * self.box2d_scale_init_factor, name=f"scale_box2d_reg{l}")
             for l, s in enumerate(self.in_strides)]
            if self.use_scale else None
        )

        pack = self.pack_train if train else self.pack_eval
        logits, box_reg_out, ctr_out, cls_tower_out = [], [], [], []
        for group in head_groups(features, pack):
            if len(group) == 1:
                l = group[0]
                x_cls = features[l]
                for conv, norm in zip(cls_convs, cls_norms):
                    # At eval the per-level BN running-stat affine folds into
                    # this level's application of the shared tower conv; in
                    # train mode live batch statistics apply as before.
                    fold = norm(None, l, train, fold_query=True)
                    x_cls = nn.relu(conv(x_cls, *fold) if fold is not None else norm(conv(x_cls), l, train))
                x_box = features[l]
                for conv, norm in zip(box_convs, box_norms):
                    fold = norm(None, l, train, fold_query=True)
                    x_box = nn.relu(conv(x_box, *fold) if fold is not None else norm(conv(x_box), l, train))

                logits.append(cls_logits(x_cls))
                reg, ctr = box_predictors(x_box)
                ctr_out.append(ctr)
                if scales is not None:
                    reg = scales[l](reg)
                # relu (improved-FCOS), not exp (fcos2d.py:151).
                box_reg_out.append(nn.relu(reg))
                cls_tower_out.append(x_cls)
                continue

            # Packed group: one conv per tower layer over a guard-banded
            # canvas; per-level norms become per-pixel affine maps (zero on
            # the guard bands, restoring the zero-gap invariant each layer).
            plan = make_pack_plan([features[l].shape[1:3] for l in group])
            canvas = pack_levels([features[l] for l in group], plan)
            x_cls = x_box = canvas
            for conv, norm in zip(cls_convs, cls_norms):
                x_cls = packed_tower_layer(x_cls, conv, norm, plan, group, in_channels,
                                           self.dtype, train)
            for conv, norm in zip(box_convs, box_norms):
                x_box = packed_tower_layer(x_box, conv, norm, plan, group, in_channels,
                                           self.dtype, train)

            logits.extend(unpack_levels(cls_logits(x_cls), plan))
            reg_pack, ctr_pack = box_predictors(x_box)
            ctr_out.extend(unpack_levels(ctr_pack, plan))
            for i, reg in enumerate(unpack_levels(reg_pack, plan)):
                if scales is not None:
                    reg = scales[group[i]](reg)
                box_reg_out.append(nn.relu(reg))
            cls_tower_out.extend(unpack_levels(x_cls, plan))

        return logits, box_reg_out, ctr_out, cls_tower_out


def fcos2d_loss(
    logits_flat: jnp.ndarray,  # (B, C, P) fp32 — component-major, P minor
    box2d_reg_flat: jnp.ndarray,  # (B, 4, P) fp32
    centerness_flat: jnp.ndarray,  # (B, P) fp32
    targets: Dict[str, jnp.ndarray],
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
    loc_loss_type: str = "giou",
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Global-batch FCOS2D losses. cf. tridet/modeling/dd3d/fcos2d.py:159-239.

    The reference normalizes by cross-worker positive count / centerness sum
    divided by world size, then DDP averages gradients — globally equivalent
    to sum/global_total, which is what we compute (XLA inserts the psum when
    the batch is sharded over the mesh). Layout: see loss_geometry.py — C/4
    on sublanes, P on lanes.
    """
    num_classes = logits_flat.shape[1]
    labels = targets["labels"]  # (B, P) int32, num_classes == background
    box2d_tgt = targets["box2d_reg_targets"]  # (B, 4, P)
    pos = targets["pos_mask"].astype(jnp.float32)  # (B, P)

    num_pos = jnp.maximum(jnp.sum(pos), 1.0)

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, num_classes, 1), 1)
    cls_target = (labels[:, None, :] == iota_c).astype(jnp.float32) * pos[:, None, :]
    loss_cls = jnp.sum(sigmoid_focal_loss(logits_flat, cls_target, focal_alpha, focal_gamma)) / num_pos

    ctr_targets = compute_ctrness_targets_t(box2d_tgt)  # (B, P)
    ctr_targets = ctr_targets * pos
    loss_denom = jnp.maximum(jnp.sum(ctr_targets), 1e-6)

    iou_elem = iou_loss_ltrb_t(box2d_reg_flat, box2d_tgt, loc_loss_type)  # (B, P)
    loss_box2d = jnp.sum(iou_elem * ctr_targets * pos) / loss_denom

    ctr_bce = optax_sigmoid_bce(centerness_flat, ctr_targets)
    loss_ctr = jnp.sum(ctr_bce * pos) / num_pos

    losses = {"loss_cls": loss_cls, "loss_box2d_reg": loss_box2d, "loss_centerness": loss_ctr}
    extra = {"loss_denom": loss_denom, "centerness_targets": ctr_targets, "num_pos": num_pos}
    return losses, extra


def decode_fcos2d_level(
    logits: jnp.ndarray,  # (B, H, W, C)
    box2d_reg: jnp.ndarray,  # (B, H, W, 4)
    centerness: jnp.ndarray,  # (B, H, W, 1)
    locations: jnp.ndarray,  # (H*W, 2)
    num_candidates: int,
    pre_nms_thresh: float,
    thresh_with_ctr: bool = True,
    use_approx_topk: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Fixed-size candidate selection for one FPN level.

    Returns per-candidate arrays of shape (B, K):
      score (sqrt'd, cf. fcos2d.py:333), box (B, K, 4 xyxy), cls, loc_idx
      (into the level's H*W grid, for the 3D head gather), valid.
    Padding candidates carry score NEG_INF.
    """
    b, h, w, c = logits.shape
    k = min(num_candidates, h * w * c)

    scores = jax.nn.sigmoid(logits.astype(jnp.float32).reshape(b, h * w, c))
    ctr = jax.nn.sigmoid(centerness.astype(jnp.float32).reshape(b, h * w, 1))
    reg = box2d_reg.astype(jnp.float32).reshape(b, h * w, 4)

    if thresh_with_ctr:
        combined = scores * ctr
        candidate_mask = combined > pre_nms_thresh
    else:
        candidate_mask = scores > pre_nms_thresh
        combined = scores * ctr

    n = h * w * c
    flat_scores = jnp.where(candidate_mask, combined, NEG_INF).reshape(b, n)
    if use_approx_topk and k < n:
        # Blocked approximate top-k: per-block max+argmax, then EXACT top-k
        # over the ~6k block maxes. Measured 3.7x faster than
        # jax.lax.approx_max_k at the P3 shape (1.06 vs 3.96 ms, batch 128,
        # n=38400, k=256) — approx_max_k's aggregation stage runs a full
        # sort over a much larger reduced set. Candidates lost to a block
        # collision share a block with a HIGHER-scored candidate <= S/C
        # locations away (blocks are consecutive in location-major order),
        # i.e. exactly the near-duplicates 2D NMS suppresses anyway.
        # (aggregate_to_topk=False was also tried: its un-aggregated result
        # set is large and blew up all downstream per-candidate work.)
        block = max(1, n // (6 * k))
        nb = -(-n // block)
        padded = jnp.pad(flat_scores, ((0, 0), (0, nb * block - n)), constant_values=NEG_INF)
        xr = padded.reshape(b, nb, block)
        bm = jnp.max(xr, axis=-1)  # (B, nb)
        am = jnp.argmax(xr, axis=-1).astype(jnp.int32)  # (B, nb)
        top_vals, block_idx = jax.lax.top_k(bm, k)  # exact over the block maxes
        in_block = jnp.take_along_axis(am, block_idx, axis=1)
        top_idx = jnp.minimum(block_idx * block + in_block, n - 1)
    else:
        top_vals, top_idx = jax.lax.top_k(flat_scores, k)  # (B, K)
    loc_idx = top_idx // c
    cls_idx = top_idx % c
    valid = top_vals > NEG_INF / 2

    reg_k = jnp.take_along_axis(reg, loc_idx[..., None], axis=1)  # (B, K, 4)
    loc_k = locations[loc_idx]  # (B, K, 2)
    boxes = jnp.stack(
        [
            loc_k[..., 0] - reg_k[..., 0],
            loc_k[..., 1] - reg_k[..., 1],
            loc_k[..., 0] + reg_k[..., 2],
            loc_k[..., 1] + reg_k[..., 3],
        ],
        axis=-1,
    )
    score = jnp.where(valid, jnp.sqrt(jnp.maximum(top_vals, 0.0)), NEG_INF)
    return {
        "score": score,
        "box": boxes,
        "cls": cls_idx,
        "loc_idx": loc_idx,
        "locations": loc_k,
        "valid": valid,
    }
