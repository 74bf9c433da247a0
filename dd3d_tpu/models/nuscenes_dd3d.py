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

from dd3d_tpu.models import register_meta_arch, build_feature_extractor
from dd3d_tpu.models.dd3d import DD3D, build_dd3d
from dd3d_tpu.models.layers import kaiming_uniform_a1
from dd3d_tpu.ops.losses import smooth_l1_loss


class NuscenesDD3D(nn.Module):
    """DD3D plus attribute/speed predictors on the shared cls tower."""

    base: DD3D
    max_num_attributes: int = 4

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> Dict[str, List[jnp.ndarray]]:
        out = self.base(images, train=train)
        attr_conv = nn.Conv(
            self.max_num_attributes, (3, 3), dtype=self.base.dtype, param_dtype=jnp.float32,
            kernel_init=kaiming_uniform_a1, name="attr_logits",
        )
        speed_conv = nn.Conv(
            1, (3, 3), dtype=self.base.dtype, param_dtype=jnp.float32,
            kernel_init=kaiming_uniform_a1, name="speed",
        )
        out["attr_logits"] = [attr_conv(x) for x in out["cls_tower_out"]]
        # speed is non-negative (relu, nuscenes_dd3d.py:374).
        out["speed"] = [nn.relu(speed_conv(x)) for x in out["cls_tower_out"]]
        return out


@register_meta_arch("NuscenesDD3D")
def build_nuscenes_dd3d(cfg) -> NuscenesDD3D:
    base = build_dd3d(cfg)
    return NuscenesDD3D(base=base, max_num_attributes=cfg.DD3D.NUSC.MAX_NUM_ATTRIBUTES)


def nuscenes_extra_losses(
    cfg,
    outputs: Dict[str, List[jnp.ndarray]],
    targets: Dict[str, jnp.ndarray],
    extra2d: Dict[str, jnp.ndarray],
) -> Dict[str, jnp.ndarray]:
    """Attribute xent + speed smooth-L1, centerness-weighted with the shared
    loss denominator. cf. nuscenes_dd3d.py:199-265.

    targets must contain 'attributes' (B, P) int with `max_num_attributes - 1`
    == ignore, and 'speeds' (B, P) float.
    """
    from dd3d_tpu.models.dd3d import flatten_levels

    attr_flat = flatten_levels(outputs["attr_logits"])  # (B, P, A)
    speed_flat = flatten_levels(outputs["speed"])[..., 0]  # (B, P)

    pos = targets["pos_mask"].astype(jnp.float32)
    weights = extra2d["centerness_targets"]
    denom = extra2d["loss_denom"]

    num_attr = attr_flat.shape[-1]
    attr_tgt = targets["attributes"]
    attr_valid = (attr_tgt < num_attr - 1) & targets["pos_mask"]  # last id == ignore
    attr_safe = jnp.where(attr_valid, attr_tgt, 0)
    logp = jax.nn.log_softmax(attr_flat, axis=-1)
    xent = -jnp.take_along_axis(logp, attr_safe[..., None], axis=-1)[..., 0]
    attr_w = weights * attr_valid.astype(jnp.float32)
    loss_attr = jnp.sum(xent * attr_w) / jnp.maximum(jnp.sum(attr_w) / jnp.maximum(jnp.sum(weights * pos), 1e-6) * denom, 1e-6)

    speed_tgt = targets["speeds"]
    speed_valid = jnp.isfinite(speed_tgt) & targets["pos_mask"]
    sl1 = smooth_l1_loss(speed_flat, jnp.where(speed_valid, speed_tgt, 0.0), beta=0.05)
    speed_w = weights * speed_valid.astype(jnp.float32)
    loss_speed = jnp.sum(sl1 * speed_w) / jnp.maximum(denom, 1e-6)

    return {
        "loss_attr": cfg.DD3D.NUSC.LOSS.WEIGHT_ATTR * loss_attr,
        "loss_speed": cfg.DD3D.NUSC.LOSS.WEIGHT_SPEED * loss_speed,
    }
