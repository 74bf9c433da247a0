"""RegNetY backbone (flax/NHWC) — the feature extractor for the reference's
`dd3d_kitti_regnety_006_bifpn` experiment.

That experiment is a DEAD config upstream: `configs/experiments/
dd3d_kitti_regnety_006_bifpn.yaml:8` names a `regnety_006_bifpn` feature
extractor whose builder never existed in the repo (SURVEY.md §2.3 note).
Here it is implemented for real, from the design-space recipe of
"Designing Network Design Spaces" (Radosavovic et al., CVPR 2020):
widths/depths are GENERATED from the (w0, wa, wm, depth) parameterization
— not hard-coded tables — and the Y-block adds squeeze-excitation with
se_ratio applied to the block input width, matching pycls/timm semantics.

Architecture: stem 3x3/s2 (32ch) -> 4 stages of residual Y-blocks
(1x1 -> 3x3 group conv (stride 2 first block) -> SE -> 1x1, projection
shortcut on shape change), output strides 4/8/16/32.
"""
from typing import Any, Dict, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from dd3d_tpu.models import register_backbone
from dd3d_tpu.models.layers import ConvNorm, kaiming_normal_fan_out


def generate_regnet_params(
    w0: float, wa: float, wm: float, depth: int, group_w: int, q: int = 8
) -> Tuple[Tuple[int, ...], Tuple[int, ...], Tuple[int, ...]]:
    """Per-stage (widths, depths, group_widths) from the RegNet recipe:
    u_j = w0 + wa*j quantized to a geometric ladder of ratio wm, rounded to
    multiples of q; consecutive equal widths form a stage; widths are then
    made divisible by the (possibly reduced) group width."""
    assert w0 > 0 and wa > 0 and wm > 1 and w0 % q == 0
    ws_cont = w0 + wa * np.arange(depth)
    ks = np.round(np.log(ws_cont / w0) / np.log(wm))
    ws_all = w0 * np.power(wm, ks)
    ws_all = (np.round(ws_all / q) * q).astype(int)
    widths, depths = [], []
    for w in ws_all:
        if widths and widths[-1] == w:
            depths[-1] += 1
        else:
            widths.append(int(w))
            depths.append(1)
    # group-width compatibility (pycls adjust_ws_gs_comp, bottleneck ratio 1)
    gws = [min(group_w, w) for w in widths]
    widths = [int(round(w / g) * g) for w, g in zip(widths, gws)]
    return tuple(widths), tuple(depths), tuple(gws)


# (w0, wa, wm, depth, group_w, se_ratio) — paper Table "RegNetY" models.
REGNETY_SPECS = {
    "RegNetY-002": (24, 36.44, 2.49, 13, 8, 0.25),
    "RegNetY-004": (48, 27.89, 2.09, 16, 8, 0.25),
    "RegNetY-006": (48, 32.54, 2.32, 15, 16, 0.25),
    "RegNetY-008": (56, 38.84, 2.40, 14, 16, 0.25),
    "RegNetY-016": (48, 20.71, 2.65, 27, 24, 0.25),
    "RegNetY-032": (80, 42.63, 2.66, 21, 24, 0.25),
}

REGNET_STRIDES = {"s1": 4, "s2": 8, "s3": 16, "s4": 32}


class SqueezeExcite(nn.Module):
    """SE over global-averaged features; reduction from the BLOCK INPUT
    width (pycls SE semantics for RegNetY)."""

    se_channels: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        s = nn.Conv(self.se_channels, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="fc2")(s)
        return x * nn.sigmoid(s)


class YBlock(nn.Module):
    """Residual bottleneck (ratio 1) with group conv + SE."""

    w_in: int
    w_out: int
    stride: int
    group_w: int
    se_ratio: float
    norm: str = "BN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        if self.w_in != self.w_out or self.stride != 1:
            shortcut = ConvNorm(self.w_out, 1, self.stride, norm=self.norm, dtype=self.dtype,
                                kernel_init=kaiming_normal_fan_out, name="proj")(x, train)
        y = ConvNorm(self.w_out, 1, 1, norm=self.norm, activation=nn.relu, dtype=self.dtype,
                     kernel_init=kaiming_normal_fan_out, name="a")(x, train)
        y = ConvNorm(self.w_out, 3, self.stride, groups=self.w_out // self.group_w,
                     norm=self.norm, activation=nn.relu, dtype=self.dtype,
                     kernel_init=kaiming_normal_fan_out, name="b")(y, train)
        if self.se_ratio > 0:
            y = SqueezeExcite(max(1, int(round(self.w_in * self.se_ratio))),
                              dtype=self.dtype, name="se")(y)
        y = ConvNorm(self.w_out, 1, 1, norm=self.norm, dtype=self.dtype,
                     kernel_init=kaiming_normal_fan_out, name="c")(y, train)
        return nn.relu(y + shortcut)


class RegNet(nn.Module):
    widths: Sequence[int]
    depths: Sequence[int]
    group_ws: Sequence[int]
    se_ratio: float = 0.25
    stem_w: int = 32
    out_features: Sequence[str] = ("s2", "s3", "s4")
    norm: str = "BN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        outputs: Dict[str, jnp.ndarray] = {}
        x = ConvNorm(self.stem_w, 3, 2, norm=self.norm, activation=nn.relu, dtype=self.dtype,
                     kernel_init=kaiming_normal_fan_out, name="stem")(x, train)
        w_in = self.stem_w
        for si, (w, d, g) in enumerate(zip(self.widths, self.depths, self.group_ws)):
            for bi in range(d):
                x = YBlock(w_in=w_in, w_out=w, stride=2 if bi == 0 else 1, group_w=g,
                           se_ratio=self.se_ratio, norm=self.norm, dtype=self.dtype,
                           name=f"s{si + 1}_b{bi}")(x, train)
                w_in = w
            name = f"s{si + 1}"
            if name in self.out_features:
                outputs[name] = x
        return outputs


@register_backbone("build_fcos_regnety_bifpn_backbone")
def build_fcos_regnety_bifpn_backbone(cfg):
    """RegNetY + BiFPN P3..P7 — realizes the reference's dead
    `regnety_006_bifpn` feature-extractor config (see module docstring).
    size_divisibility 128 (P7), like the DLA p67 builder."""
    from dd3d_tpu.models.bifpn import BiFPN

    dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
    name = cfg.FE.BACKBONE.NAME
    if name not in REGNETY_SPECS:
        raise KeyError(f"Unknown RegNetY variant {name!r}; known: {sorted(REGNETY_SPECS)}")
    w0, wa, wm, depth, group_w, se_ratio = REGNETY_SPECS[name]
    widths, depths, gws = generate_regnet_params(w0, wa, wm, depth, group_w)
    trunk = RegNet(
        widths=widths,
        depths=depths,
        group_ws=gws,
        se_ratio=se_ratio,
        out_features=("s2", "s3", "s4"),
        norm=cfg.FE.BACKBONE.NORM,
        dtype=dtype,
    )
    bifpn_cfg = cfg.FE.get("BIFPN", {})
    return BiFPN(
        bottom_up=trunk,
        in_features=("s2", "s3", "s4"),
        in_strides=REGNET_STRIDES,
        out_channels=int(bifpn_cfg.get("OUT_CHANNELS", 160)),
        num_repeats=int(bifpn_cfg.get("NUM_REPEATS", 3)),
        norm=bifpn_cfg.get("NORM", "BN"),
        dtype=dtype,
    )
