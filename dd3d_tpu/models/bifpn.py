"""BiFPN (EfficientDet, Tan et al. CVPR 2020) in flax/NHWC.

Completes the reference's dead `regnety_006_bifpn` feature-extractor config
(see models/regnet.py docstring). Bidirectional cross-scale fusion over
P3..P7 with fast normalized fusion (relu'd scalar weights / sum) and
depthwise-separable 3x3 convs (+BN, swish), repeated NUM_REPEATS times.

Input resampling: C3/C4/C5 enter through 1x1 conv+BN channel projections;
P6 = stride-2 3x3-maxpool of projected C5, P7 = maxpool of P6 (the
EfficientDet resample path). Downsampling inside cells is 3x3/s2 maxpool,
upsampling is nearest 2x — all shape-static, XLA-friendly ops.
"""
from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dd3d_tpu.models.fpn import _upsample_nearest_2x, c2_xavier_fill
from dd3d_tpu.models.layers import ConvNorm, FoldableConv


def _maxpool_s2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")


class SepConvBN(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 + BN (+ swish) — the BiFPN conv.
    The pointwise conv + norm go through ConvNorm so FrozenBN folds into
    the kernel (the regnety experiment runs BIFPN.NORM=FrozenBN)."""

    features: int
    norm: str = "BN"
    activation: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = FoldableConv(c, kernel_size=3, groups=c, use_bias=False, dtype=self.dtype,
                         kernel_init=c2_xavier_fill, name="dw")(x)
        return ConvNorm(self.features, 1, norm=self.norm,
                        activation=nn.swish if self.activation else None,
                        dtype=self.dtype, kernel_init=c2_xavier_fill, name="pw")(x, train)


class _Fuse(nn.Module):
    """Fast normalized fusion: sum_i relu(w_i) x_i / (sum relu(w) + eps)."""

    n: int

    @nn.compact
    def __call__(self, inputs):
        w = self.param("w", nn.initializers.ones, (self.n,), jnp.float32)
        w = nn.relu(w)
        w = (w / (jnp.sum(w) + 1e-4)).astype(inputs[0].dtype)
        return sum(w[i] * x for i, x in enumerate(inputs))


class BiFPNCell(nn.Module):
    channels: int
    norm: str = "BN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # feats: [P3, P4, P5, P6, P7] low->high stride
        p3, p4, p5, p6, p7 = feats

        def fuse_conv(name, inputs):
            y = _Fuse(len(inputs), name=f"{name}_w")(inputs)
            return SepConvBN(self.channels, norm=self.norm, dtype=self.dtype,
                             name=f"{name}_conv")(y, train)

        # top-down
        p6_td = fuse_conv("p6_td", [p6, _upsample_nearest_2x(p7)])
        p5_td = fuse_conv("p5_td", [p5, _upsample_nearest_2x(p6_td)])
        p4_td = fuse_conv("p4_td", [p4, _upsample_nearest_2x(p5_td)])
        p3_out = fuse_conv("p3_out", [p3, _upsample_nearest_2x(p4_td)])
        # bottom-up
        p4_out = fuse_conv("p4_out", [p4, p4_td, _maxpool_s2(p3_out)])
        p5_out = fuse_conv("p5_out", [p5, p5_td, _maxpool_s2(p4_out)])
        p6_out = fuse_conv("p6_out", [p6, p6_td, _maxpool_s2(p5_out)])
        p7_out = fuse_conv("p7_out", [p7, _maxpool_s2(p6_out)])
        return [p3_out, p4_out, p5_out, p6_out, p7_out]


class BiFPN(nn.Module):
    """Trunk C3..C5 -> BiFPN P3..P7 feature extractor."""

    bottom_up: nn.Module
    in_features: Sequence[str]  # trunk names for strides 8, 16, 32
    in_strides: Dict[str, int]
    out_channels: int = 160
    num_repeats: int = 3
    norm: str = "BN"
    dtype: Any = jnp.bfloat16

    @property
    def out_feature_strides(self) -> Dict[str, int]:
        s0 = min(self.in_strides[f] for f in self.in_features)
        return {f"p{(s0 * 2 ** i).bit_length() - 1}": s0 * 2 ** i for i in range(5)}

    @property
    def out_features(self) -> Tuple[str, ...]:
        return tuple(sorted(self.out_feature_strides, key=lambda k: self.out_feature_strides[k]))

    @property
    def size_divisibility(self) -> int:
        return max(self.out_feature_strides.values())

    @nn.compact
    def __call__(self, x, train: bool = False):
        trunk = self.bottom_up(x, train=train)

        feats = []
        for f in self.in_features:  # C3, C4, C5 projections
            feats.append(
                ConvNorm(self.out_channels, 1, norm=self.norm, dtype=self.dtype,
                         kernel_init=c2_xavier_fill, name=f"proj_{f}")(trunk[f], train)
            )
        p6 = _maxpool_s2(feats[-1])
        p7 = _maxpool_s2(p6)
        feats = feats + [p6, p7]

        for r in range(self.num_repeats):
            feats = BiFPNCell(self.out_channels, norm=self.norm, dtype=self.dtype,
                              name=f"cell{r}")(feats, train)

        names = self.out_features
        return {n: f for n, f in zip(names, feats)}
