"""VoVNet V2 backbone (One-Shot Aggregation + eSE) in flax/NHWC.

Rebuild of `tridet/modeling/feature_extractor/vovnet.py`: OSA modules
(concat aggregation of a chain of 3x3 convs + 1x1 concat conv + effective
Squeeze-Excitation), stem of stride 4, stages 2..5, including the
V-99-eSE preset used by the DD3D KITTI V2-99 experiment.
"""
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from dd3d_tpu.models import register_backbone
from dd3d_tpu.models.fpn import FPN
from dd3d_tpu.models.layers import ConvNorm

# name -> spec; cf. vovnet.py:19-97
VOVNET_SPECS = {
    "V-19-slim-dw-eSE": dict(stem=[64, 64, 64], stage_conv_ch=[64, 80, 96, 112],
                             stage_out_ch=[112, 256, 384, 512], layer_per_block=3,
                             block_per_stage=[1, 1, 1, 1], eSE=True, dw=True),
    "V-19-dw-eSE": dict(stem=[64, 64, 64], stage_conv_ch=[128, 160, 192, 224],
                        stage_out_ch=[256, 512, 768, 1024], layer_per_block=3,
                        block_per_stage=[1, 1, 1, 1], eSE=True, dw=True),
    "V-19-slim-eSE": dict(stem=[64, 64, 128], stage_conv_ch=[64, 80, 96, 112],
                          stage_out_ch=[112, 256, 384, 512], layer_per_block=3,
                          block_per_stage=[1, 1, 1, 1], eSE=True, dw=False),
    "V-19-eSE": dict(stem=[64, 64, 128], stage_conv_ch=[128, 160, 192, 224],
                     stage_out_ch=[256, 512, 768, 1024], layer_per_block=3,
                     block_per_stage=[1, 1, 1, 1], eSE=True, dw=False),
    "V-39-eSE": dict(stem=[64, 64, 128], stage_conv_ch=[128, 160, 192, 224],
                     stage_out_ch=[256, 512, 768, 1024], layer_per_block=5,
                     block_per_stage=[1, 1, 2, 2], eSE=True, dw=False),
    "V-57-eSE": dict(stem=[64, 64, 128], stage_conv_ch=[128, 160, 192, 224],
                     stage_out_ch=[256, 512, 768, 1024], layer_per_block=5,
                     block_per_stage=[1, 1, 4, 3], eSE=True, dw=False),
    "V-99-eSE": dict(stem=[64, 64, 128], stage_conv_ch=[128, 160, 192, 224],
                     stage_out_ch=[256, 512, 768, 1024], layer_per_block=5,
                     block_per_stage=[1, 3, 9, 3], eSE=True, dw=False),
}


def hsigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


class ESEModule(nn.Module):
    """Effective squeeze-excitation: GAP -> 1x1 conv -> hsigmoid gate.
    cf. vovnet.py:177-238."""

    channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        gate = jnp.mean(x, axis=(1, 2), keepdims=True)
        gate = nn.Conv(self.channels, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="fc")(gate)
        return x * hsigmoid(gate)


class DWConvBlock(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 (+norm+relu), cf. dw_conv3x3
    (vovnet.py:100-121)."""

    channels: int
    norm: str = "BN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.channels, (3, 3), padding=1, feature_group_count=self.channels,
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="dw")(x)
        return ConvNorm(self.channels, 1, 1, norm=self.norm, activation=nn.relu,
                        dtype=self.dtype, name="pw")(x, train)


class OSAModule(nn.Module):
    """One-shot aggregation block. cf. vovnet.py:188-238."""

    stage_ch: int
    concat_ch: int
    layer_per_block: int
    use_ese: bool = True
    identity: bool = False
    depthwise: bool = False
    norm: str = "BN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity_feat = x
        outputs = [x]
        if self.depthwise and x.shape[-1] != self.stage_ch:
            # channel reduction before dw chain (vovnet.py:206-210)
            x = ConvNorm(self.stage_ch, 1, 1, norm=self.norm, activation=nn.relu,
                         dtype=self.dtype, name="conv_reduction")(x, train)
        for i in range(self.layer_per_block):
            if self.depthwise:
                x = DWConvBlock(self.stage_ch, norm=self.norm, dtype=self.dtype, name=f"layer{i}")(x, train)
            else:
                x = ConvNorm(self.stage_ch, 3, 1, norm=self.norm, activation=nn.relu, dtype=self.dtype, name=f"layer{i}")(
                    x, train
                )
            outputs.append(x)
        x = jnp.concatenate(outputs, axis=-1)
        xt = ConvNorm(self.concat_ch, 1, 1, norm=self.norm, activation=nn.relu, dtype=self.dtype, name="concat")(x, train)
        if self.use_ese:
            xt = ESEModule(self.concat_ch, dtype=self.dtype, name="ese")(xt)
        if self.identity:
            xt = xt + identity_feat
        return xt


class VoVNet(nn.Module):
    """VoVNet V2 trunk; emits `stage{2..5}` features (strides 4, 8, 16, 32).
    cf. vovnet.py:276-373."""

    variant: str
    out_features: Sequence[str] = ("stage3", "stage4", "stage5")
    norm: str = "BN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = VOVNET_SPECS[self.variant]
        stem_ch = spec["stem"]
        outputs = {}

        # Stem: conv s2, conv s1, conv s2 -> stride 4 (vovnet.py:297-301).
        x = ConvNorm(stem_ch[0], 3, 2, norm=self.norm, activation=nn.relu, dtype=self.dtype, name="stem1")(x, train)
        x = ConvNorm(stem_ch[1], 3, 1, norm=self.norm, activation=nn.relu, dtype=self.dtype, name="stem2")(x, train)
        x = ConvNorm(stem_ch[2], 3, 2, norm=self.norm, activation=nn.relu, dtype=self.dtype, name="stem3")(x, train)
        if "stem" in self.out_features:
            outputs["stem"] = x

        for i in range(4):
            stage_num = i + 2
            name = f"stage{stage_num}"
            if stage_num != 2:
                # torch's MaxPool2d(3, 2, ceil_mode=True) (vovnet.py:246):
                # windows start at row/col 0 and the input is implicitly
                # padded at the BOTTOM/RIGHT only when (dim - 3) is odd.
                # Symmetric (1, 1) padding would shift every window by one
                # pixel and break checkpoint parity.
                ph = (x.shape[1] - 3) % 2
                pw = (x.shape[2] - 3) % 2
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((0, ph), (0, pw)))
            blocks = spec["block_per_stage"][i]
            for b in range(blocks):
                # The reference constructs AND applies eSE in every OSA block
                # regardless of the SE flag (the flag is dead code:
                # _OSA_module.__init__ always builds self.ese and forward
                # always calls it, vovnet.py:216-236). Gating it per-block
                # would drop ese.fc tensors from every non-last block of the
                # multi-block V-39/57/99 stages and break checkpoint parity.
                x = OSAModule(
                    spec["stage_conv_ch"][i],
                    spec["stage_out_ch"][i],
                    spec["layer_per_block"],
                    use_ese=True,
                    identity=(b > 0),
                    depthwise=spec.get("dw", False),
                    norm=self.norm,
                    dtype=self.dtype,
                    name=f"OSA{stage_num}_{b + 1}",
                )(x, train=train)
            if name in self.out_features:
                outputs[name] = x
        return outputs


VOVNET_STRIDES = {"stem": 4, "stage2": 4, "stage3": 8, "stage4": 16, "stage5": 32}


def _vovnet_trunk(cfg, dtype):
    name = cfg.FE.BACKBONE.NAME
    spec = VOVNET_SPECS[name]
    trunk = VoVNet(
        variant=name,
        out_features=tuple(cfg.FE.BACKBONE.OUT_FEATURES),
        norm=cfg.FE.BACKBONE.NORM,
        dtype=dtype,
    )
    channels = {"stem": spec["stem"][2]}
    for i in range(4):
        channels[f"stage{i + 2}"] = spec["stage_out_ch"][i]
    return trunk, channels, VOVNET_STRIDES


@register_backbone("build_fcos_vovnet_fpn_backbone_p6")
def build_fcos_vovnet_fpn_backbone_p6(cfg):
    """VoVNet + FPN + P6 top level — the V2-99 DD3D backbone.
    cf. vovnet.py:431-454."""
    dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
    trunk, channels, strides = _vovnet_trunk(cfg, dtype)
    return FPN(
        bottom_up=trunk,
        in_features=tuple(cfg.FE.FPN.IN_FEATURES),
        in_channels={f: channels[f] for f in cfg.FE.FPN.IN_FEATURES},
        in_strides={f: strides[f] for f in cfg.FE.FPN.IN_FEATURES},
        out_channels=cfg.FE.FPN.OUT_CHANNELS,
        norm=cfg.FE.FPN.NORM,
        fuse_type=cfg.FE.FPN.FUSE_TYPE,
        top_block="p6",
        dtype=dtype,
    )


@register_backbone("build_vovnet_fpn_backbone")
def build_vovnet_fpn_backbone(cfg):
    """VoVNet + FPN + max-pool top level. cf. vovnet.py:388-408."""
    dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
    trunk, channels, strides = _vovnet_trunk(cfg, dtype)
    return FPN(
        bottom_up=trunk,
        in_features=tuple(cfg.FE.FPN.IN_FEATURES),
        in_channels={f: channels[f] for f in cfg.FE.FPN.IN_FEATURES},
        in_strides={f: strides[f] for f in cfg.FE.FPN.IN_FEATURES},
        out_channels=cfg.FE.FPN.OUT_CHANNELS,
        norm=cfg.FE.FPN.NORM,
        fuse_type=cfg.FE.FPN.FUSE_TYPE,
        top_block="maxpool",
        dtype=dtype,
    )
