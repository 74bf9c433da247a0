"""NuscenesDD3D meta-architecture: DD3D + attribute/speed heads.

Rebuild of `tridet/modeling/dd3d/nuscenes_dd3d.py`: adds per-location
attribute logits (max_num_attributes) and a relu'd speed branch computed from
the cls-tower features (nuscenes_dd3d.py:310-311,371-374), their losses
(cross-entropy attr / smooth-L1 speed, centerness-weighted,
nuscenes_dd3d.py:199-265), and candidate decode carrying attributes/speeds.

Cross-camera (6-cam sample) aggregation + global BEV-NMS lives in
`dd3d_tpu/ops/bev_nms.py` + `dd3d_tpu/models/postprocessing.py`.
"""
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dd3d_tpu.models import register_meta_arch
from dd3d_tpu.models.dd3d import DD3D, build_dd3d
from dd3d_tpu.models.layers import PredictorConv, fused_predictor_apply, kaiming_uniform_a1
from dd3d_tpu.models.level_pack import head_groups, make_pack_plan, pack_levels, unpack_levels
from dd3d_tpu.ops.losses import smooth_l1_loss


class NuscenesDD3D(nn.Module):
    """DD3D plus attribute/speed predictors on the shared cls tower."""

    base: DD3D
    max_num_attributes: int = 4

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> Dict[str, List[jnp.ndarray]]:
        out = self.base(images, train=train)
        in_channels = out["cls_tower_out"][0].shape[-1]
        attr_conv = PredictorConv(
            self.max_num_attributes, in_channels, dtype=self.base.dtype,
            kernel_init=kaiming_uniform_a1, name="attr_logits",
        )
        speed_conv = PredictorConv(
            1, in_channels, dtype=self.base.dtype,
            kernel_init=kaiming_uniform_a1, name="speed",
        )

        def predictors(x):
            # Both read the same cls-tower feature: one concat-conv + split
            # (exact — layers.fused_predictor_apply).
            attr, speed = fused_predictor_apply(x, [attr_conv, speed_conv], self.base.dtype)
            # speed is non-negative (relu, nuscenes_dd3d.py:374).
            return attr, nn.relu(speed)

        towers = out["cls_tower_out"]
        pack = self.base.pack_heads_train if train else self.base.pack_heads_eval
        groups = head_groups(towers, pack)
        attr_out, speed_out = [], []
        for group in groups:
            if len(group) == 1:
                attr, speed = predictors(towers[group[0]])
                attr_out.append(attr)
                speed_out.append(speed)
            else:
                # Shared predictors over the packed small levels — one conv
                # call instead of len(group) (models/level_pack.py). Guard
                # bands only pick up the conv bias, and are sliced away.
                # This re-packs slices FCOS2DHead just unpacked from an
                # identical canvas; threading the canvas through the output
                # dict would save 4 dynamic_update_slices over ~1.5 MB —
                # negligible next to the saved convs, not worth widening
                # the meta-arch output contract.
                plan = make_pack_plan([towers[l].shape[1:3] for l in group])
                canvas = pack_levels([towers[l] for l in group], plan)
                attr_pack, speed_pack = predictors(canvas)
                attr_out.extend(unpack_levels(attr_pack, plan))
                speed_out.extend(unpack_levels(speed_pack, plan))
        out["attr_logits"] = attr_out
        out["speed"] = speed_out
        return out


@register_meta_arch("NuscenesDD3D")
def build_nuscenes_dd3d(cfg) -> NuscenesDD3D:
    base = build_dd3d(cfg)
    return NuscenesDD3D(base=base, max_num_attributes=cfg.DD3D.NUSC.MAX_NUM_ATTRIBUTES)


def nuscenes_dd3d_losses(cfg, outputs, batch, strides=None):
    """Full NuscenesDD3D loss: DD3D losses + attribute xent + speed smooth-L1.

    cf. NuscenesLoss (nuscenes_dd3d.py:199-265). The speed loss is a
    centerness-weighted sum normalized by the (global) centerness mass of the
    locations with valid speed targets. The attribute loss mirrors the
    reference's quirk EXACTLY (single-process semantics over the global
    batch): F.cross_entropy with mean reduction produces the UNWEIGHTED mean
    xent over valid locations, which is then multiplied by the summed
    centerness weights and divided by max(that same sum, 1e-6) — i.e. the
    plain mean xent, except a near-zero weight mass scales it toward 0.

    batch must additionally carry gt_attributes (B, G) with
    MAX_NUM_ATTRIBUTES - 1 == "ignore" and gt_speeds (B, G).
    """
    from dd3d_tpu.models.dd3d import dd3d_losses, flatten_levels_t

    losses, targets, extra = dd3d_losses(cfg, outputs, batch, return_aux=True, strides=strides)

    attr_flat = flatten_levels_t(outputs["attr_logits"])  # (B, A, P)
    speed_flat = flatten_levels_t(outputs["speed"])[:, 0]  # (B, P)
    num_attr = attr_flat.shape[1]

    pos_mask = targets["pos_mask"]
    matched = jnp.maximum(targets["target_inds"], 0)
    # Matched-GT lookups as one-hot contractions over G (per-(b, p) gathers
    # serialize on the TPU scalar core; see prepare_targets.py). (B, G, P)
    # layout: P minor (lane-aligned), G on sublanes — see prepare_targets.py.
    num_gt = batch["gt_attributes"].shape[1]
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (1, num_gt, 1), 1)
    onehot_g = (matched[:, None, :] == iota_g).astype(jnp.float32)  # (B, G, P)
    # multiply-reduce, not einsum (exact in fp32; see prepare_targets.py)
    attr_tgt = jnp.sum(onehot_g * batch["gt_attributes"].astype(jnp.float32)[:, :, None], axis=1).astype(jnp.int32)
    # NaN GT speeds must survive the contraction (NaN * 0 = NaN), so select
    # the finiteness mask and the zero-filled value separately.
    gt_speeds = batch["gt_speeds"]
    speed_fin = jnp.sum(onehot_g * jnp.isfinite(gt_speeds).astype(jnp.float32)[:, :, None], axis=1) > 0.5
    speed_tgt_val = jnp.sum(onehot_g * jnp.where(jnp.isfinite(gt_speeds), gt_speeds, 0.0)[:, :, None], axis=1)

    weights = extra["centerness_targets"]  # already pos-masked

    # Attributes: ignore id == num_attr - 1 (nuscenes build: 3 per group + ignore).
    attr_valid = (attr_tgt < num_attr - 1) & pos_mask
    attr_safe = jnp.where(attr_valid, attr_tgt, 0)
    logp = jax.nn.log_softmax(attr_flat, axis=1)  # (B, A, P)
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (1, num_attr, 1), 1)
    onehot_a = (attr_safe[:, None, :] == iota_a).astype(logp.dtype)
    xent = -jnp.sum(logp * onehot_a, axis=1)  # (B, P)
    attr_valid_f = attr_valid.astype(jnp.float32)
    attr_w = weights * attr_valid_f
    # Reference-exact (nuscenes_dd3d.py:230-239): mean xent over valid
    # positives (cross_entropy's default mean reduction), scaled by
    # wsum / max(wsum, 1e-6) — identity except at near-zero weight mass.
    mean_xent = jnp.sum(xent * attr_valid_f) / jnp.maximum(jnp.sum(attr_valid_f), 1.0)
    wsum = jnp.sum(attr_w)
    losses["loss_attr"] = cfg.DD3D.NUSC.LOSS.WEIGHT_ATTR * mean_xent * wsum / jnp.maximum(wsum, 1e-6)

    # Speed: NaN GT speeds are invalid (nuscenes_dd3d.py:245-247).
    speed_valid = speed_fin & pos_mask
    sl1 = smooth_l1_loss(speed_flat, jnp.where(speed_valid, speed_tgt_val, 0.0), beta=0.05)
    speed_w = weights * speed_valid.astype(jnp.float32)
    speed_denom = jnp.maximum(jnp.sum(speed_w), 1e-6)
    losses["loss_speed"] = cfg.DD3D.NUSC.LOSS.WEIGHT_SPEED * jnp.sum(sl1 * speed_w) / speed_denom
    return losses
