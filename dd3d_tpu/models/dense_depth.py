"""DD3DDenseDepth: depth-pretraining meta-architecture.

Rebuild of `tridet/modeling/dd3d/dense_depth.py` + `dense_depth_loss.py`:
FPN features -> shared conv tower (per-level norms) -> per-level 1-channel
depth maps with per-level Scale/Offset (depth statistics init), upsampled to
full resolution with `aligned_bilinear`, focal-length scaled, trained with a
masked smooth-L1 against sparse GT depth; per-level losses decayed by
sqrt(2)^level (dense_depth.py:154-171). Inference is not implemented in the
reference either (dense_depth.py:173).
"""
from typing import Any, Dict, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dd3d_tpu.models import register_meta_arch, build_feature_extractor
from dd3d_tpu.models.layers import Offset, PerLevelNorms, Scale, kaiming_normal_fan_out, kaiming_uniform_a1
from dd3d_tpu.ops.locations import aligned_bilinear
from dd3d_tpu.ops.losses import smooth_l1_loss


class DenseDepthHead(nn.Module):
    """cf. DD3DDenseDepthHead, dense_depth.py:17-104."""

    in_strides: Sequence[int]
    mean_depth_per_level: Sequence[float]
    std_depth_per_level: Sequence[float]
    num_convs: int = 4
    norm: str = "FrozenBN"
    use_scale: bool = True
    depth_scale_init_factor: float = 0.3
    # Pack small levels into one canvas for the shared tower (level_pack.py).
    pack_eval: bool = False
    pack_train: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: List[jnp.ndarray], train: bool = False) -> List[jnp.ndarray]:
        from dd3d_tpu.models.level_pack import (
            head_groups, make_pack_plan, pack_levels, packed_tower_layer, unpack_levels,
        )

        num_levels = len(features)
        in_channels = features[0].shape[-1]
        convs = [
            nn.Conv(in_channels, (3, 3), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=kaiming_normal_fan_out, name=f"box3d_tower_conv{i}")
            for i in range(self.num_convs)
        ]
        norms = [
            PerLevelNorms(num_levels, in_channels, self.norm, dtype=self.dtype, name=f"box3d_tower_norm{i}")
            for i in range(self.num_convs)
        ]
        preds = [
            nn.Conv(1, (3, 3), use_bias=not self.use_scale, dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=kaiming_uniform_a1, name=f"dense_depth{l}")
            for l in range(num_levels)
        ]

        def predict(x, l):
            d = preds[l](x)
            if self.use_scale:
                d = Scale(float(self.std_depth_per_level[l]) * self.depth_scale_init_factor, name=f"scale_depth{l}")(d)
                d = Offset(float(self.mean_depth_per_level[l]), name=f"offset_depth{l}")(d)
            return d

        out = []
        pack = self.pack_train if train else self.pack_eval
        for group in head_groups(features, pack):
            if len(group) == 1:
                l = group[0]
                x = features[l]
                for conv, norm in zip(convs, norms):
                    x = nn.relu(norm(conv(x), l, train))
                out.append(predict(x, l))
            else:
                plan = make_pack_plan([features[l].shape[1:3] for l in group])
                x = pack_levels([features[l] for l in group], plan)
                for conv, norm in zip(convs, norms):
                    x = packed_tower_layer(x, conv, norm, plan, group, in_channels,
                                           self.dtype, train)
                for i, xl in enumerate(unpack_levels(x, plan)):
                    out.append(predict(xl, group[i]))
        return out


class DD3DDenseDepth(nn.Module):
    """cf. DD3DDenseDepth, dense_depth.py:107-173."""

    backbone: nn.Module
    strides: Sequence[int]
    pixel_mean: Sequence[float]
    pixel_std: Sequence[float]
    mean_depth_per_level: Sequence[float]
    std_depth_per_level: Sequence[float]
    num_convs: int = 4
    norm: str = "FrozenBN"
    use_scale: bool = True
    depth_scale_init_factor: float = 0.3
    scale_depth_by_focal_lengths: bool = True
    scale_depth_by_focal_lengths_factor: float = 500.0
    locations_offset: str = "none"
    pack_heads_eval: bool = False
    pack_heads_train: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray, inv_intrinsics=None, train: bool = False) -> List[jnp.ndarray]:
        mean = jnp.asarray(self.pixel_mean, dtype=jnp.float32)
        std = jnp.asarray(self.pixel_std, dtype=jnp.float32)
        x = ((images - mean) / std).astype(self.dtype)
        feats = self.backbone(x, train=train)
        level_names = sorted(feats.keys(), key=lambda k: int(k[1:]))
        features = [feats[k] for k in level_names]

        depth_maps = DenseDepthHead(
            in_strides=tuple(self.strides),
            mean_depth_per_level=tuple(self.mean_depth_per_level),
            std_depth_per_level=tuple(self.std_depth_per_level),
            num_convs=self.num_convs,
            norm=self.norm,
            use_scale=self.use_scale,
            depth_scale_init_factor=self.depth_scale_init_factor,
            pack_eval=self.pack_heads_eval,
            pack_train=self.pack_heads_train,
            dtype=self.dtype,
            name="fcos3d_head",
        )(features, train=train)

        # Upsample to full resolution (dense_depth.py:154-157).
        depth_full = [
            aligned_bilinear(d.astype(jnp.float32), factor=s, offset=self.locations_offset)[..., 0]
            for d, s in zip(depth_maps, self.strides)
        ]
        if self.scale_depth_by_focal_lengths and inv_intrinsics is not None:
            pixel_size = jnp.sqrt(inv_intrinsics[:, 0, 0] ** 2 + inv_intrinsics[:, 1, 1] ** 2)
            scaled = (pixel_size * self.scale_depth_by_focal_lengths_factor)[:, None, None]
            depth_full = [d / scaled for d in depth_full]
        return depth_full


@register_meta_arch("DD3DDenseDepth")
def build_dd3d_dense_depth(cfg) -> DD3DDenseDepth:
    backbone = build_feature_extractor(cfg)
    strides = [backbone.out_feature_strides[f] for f in backbone.out_features]
    return DD3DDenseDepth(
        backbone=backbone,
        strides=tuple(strides),
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        mean_depth_per_level=tuple(cfg.DD3D.FCOS3D.MEAN_DEPTH_PER_LEVEL),
        std_depth_per_level=tuple(cfg.DD3D.FCOS3D.STD_DEPTH_PER_LEVEL),
        num_convs=cfg.DD3D.FCOS3D.NUM_CONVS,
        norm=cfg.DD3D.FCOS3D.NORM,
        use_scale=cfg.DD3D.FCOS3D.USE_SCALE,
        depth_scale_init_factor=cfg.DD3D.FCOS3D.DEPTH_SCALE_INIT_FACTOR,
        scale_depth_by_focal_lengths=cfg.DD3D.FCOS3D.SCALE_DEPTH_BY_FOCAL_LENGTHS,
        scale_depth_by_focal_lengths_factor=cfg.DD3D.FCOS3D.SCALE_DEPTH_BY_FOCAL_LENGTHS_FACTOR,
        locations_offset=cfg.DD3D.FEATURE_LOCATIONS_OFFSET,
        pack_heads_eval=bool(cfg.TPU.get("PACKED_HEADS", False)),
        pack_heads_train=bool(cfg.TPU.get("PACKED_HEADS_TRAIN", False)),
        dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE),
    )


def dd3d_dense_depth_losses(cfg, depth_preds: List[jnp.ndarray], batch: Dict[str, jnp.ndarray], strides=None):
    """Train-step loss adapter for the DD3DDenseDepth meta-arch: maps the
    model's per-level full-res depth maps + the batch's sparse GT depth onto
    `dense_depth_losses` with the config's depth range / loss weight
    (cf. DD3DDenseDepth.forward training branch, dense_depth.py:141-171)."""
    if "depth" not in batch:
        raise KeyError("DD3DDenseDepth training requires a 'depth' array in the batch "
                       "(sparse GT depth; enable MODEL.DEPTH_ON so the mapper keeps it).")
    f3d = cfg.DD3D.FCOS3D
    return dense_depth_losses(
        depth_preds,
        batch["depth"],
        beta=f3d.LOSS.SMOOTH_L1_BETA,
        min_depth=f3d.MIN_DEPTH,
        max_depth=f3d.MAX_DEPTH,
        loss_weight=f3d.DEPTH_HEAD.LOSS_WEIGHT,
    )


def dense_depth_losses(
    depth_preds: List[jnp.ndarray],  # per-level (B, H, W) full-res predictions
    gt_depth: jnp.ndarray,  # (B, H, W) sparse GT (0 = missing)
    beta: float = 0.05,
    min_depth: float = 0.1,
    max_depth: float = 80.0,
    loss_weight: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Masked smooth-L1 per level with sqrt(2)^lvl decay.
    cf. dense_depth.py:165-171, dense_depth_loss.py:28-36."""
    valid = (gt_depth >= min_depth) & (gt_depth <= max_depth)
    denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    losses = {}
    for lvl, pred in enumerate(depth_preds):
        elem = smooth_l1_loss(pred, gt_depth, beta)
        loss = jnp.sum(jnp.where(valid, elem, 0.0)) / denom
        losses[f"loss_dense_depth_lvl_{lvl}"] = loss_weight * loss / (jnp.sqrt(2.0) ** lvl)
    return losses
