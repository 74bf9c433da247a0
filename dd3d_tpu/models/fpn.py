"""Feature Pyramid Network in flax/NHWC.

Rebuild of detectron2's FPN as used by the reference backbones
(`tridet/modeling/feature_extractor/dla.py:13,462-561`,
`vovnet.py:376-454`): 1x1 lateral convs + 3x3 output convs, nearest-neighbor
top-down upsampling, sum/avg fusion, and the RetinaNet-style extra levels
(P6 / P6P7 taking the P5 output as input, or a max-pool level).
"""
from typing import Any, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dd3d_tpu.models.layers import ConvNorm

# caffe2 XavierFill == uniform(-sqrt(3/fan_in), sqrt(3/fan_in)) — the init for
# FPN convs and extra-level convs in detectron2.
c2_xavier_fill = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


def _upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class FPN(nn.Module):
    """FPN over a bottom-up trunk; returns a dict of `p{k}` features.

    Output levels: p3..p5 from the trunk's (stride 8/16/32) features plus the
    configured top block: "p6p7" (strides 64, 128 — KITTI DD3D config),
    "p6" (stride 64 — V2-99 config), or "maxpool" (d2's LastLevelMaxPool).
    """

    bottom_up: nn.Module
    in_features: Sequence[str]
    in_channels: Dict[str, int]
    in_strides: Dict[str, int]
    out_channels: int = 256
    norm: str = ""
    fuse_type: str = "sum"
    top_block: Optional[str] = "p6p7"
    dtype: Any = jnp.bfloat16

    @property
    def out_feature_strides(self) -> Dict[str, int]:
        strides = {}
        for f in self.in_features:
            s = self.in_strides[f]
            strides[f"p{s.bit_length() - 1}"] = s
        max_s = max(self.in_strides[f] for f in self.in_features)
        if self.top_block in ("p6", "maxpool"):
            strides[f"p{(max_s * 2).bit_length() - 1}"] = max_s * 2
        elif self.top_block == "p6p7":
            strides[f"p{(max_s * 2).bit_length() - 1}"] = max_s * 2
            strides[f"p{(max_s * 4).bit_length() - 1}"] = max_s * 4
        return strides

    @property
    def out_features(self) -> Tuple[str, ...]:
        return tuple(sorted(self.out_feature_strides, key=lambda k: self.out_feature_strides[k]))

    @property
    def size_divisibility(self) -> int:
        # trunk divisibility (32) x top-block factor, cf. dla.py:533,561.
        return max(self.out_feature_strides.values())

    @nn.compact
    def __call__(self, x, train: bool = False):
        trunk_feats = self.bottom_up(x, train=train)

        # Top-down pathway, highest stride first.
        feats_high_to_low = list(reversed(list(self.in_features)))
        results = {}
        prev = None
        for f in feats_high_to_low:
            lateral = ConvNorm(
                self.out_channels, 1, 1, norm=self.norm, dtype=self.dtype,
                kernel_init=c2_xavier_fill, name=f"fpn_lateral_{f}",
            )(trunk_feats[f], train)
            if prev is not None:
                top_down = _upsample_nearest_2x(prev)
                lateral = lateral + top_down
                if self.fuse_type == "avg":
                    lateral = lateral / 2.0
            prev = lateral
            stride = self.in_strides[f]
            out = ConvNorm(
                self.out_channels, 3, 1, norm=self.norm, dtype=self.dtype,
                kernel_init=c2_xavier_fill, name=f"fpn_output_{f}",
            )(lateral, train)
            results[f"p{stride.bit_length() - 1}"] = out

        max_stride = max(self.in_strides[f] for f in self.in_features)
        p_top = results[f"p{max_stride.bit_length() - 1}"]
        if self.top_block == "maxpool":
            name = f"p{(max_stride * 2).bit_length() - 1}"
            results[name] = nn.max_pool(p_top, (1, 1), strides=(2, 2))
        elif self.top_block == "p6":
            # LastLevelP6 on the P5 *output* (in_feature="p5", dla.py:485-533).
            name = f"p{(max_stride * 2).bit_length() - 1}"
            results[name] = nn.Conv(
                self.out_channels, (3, 3), strides=2, padding=1, dtype=self.dtype,
                param_dtype=jnp.float32, kernel_init=c2_xavier_fill, name="top_p6",
            )(p_top)
        elif self.top_block == "p6p7":
            # d2 LastLevelP6P7 on "p5" (dla.py:536-561).
            n6 = f"p{(max_stride * 2).bit_length() - 1}"
            n7 = f"p{(max_stride * 4).bit_length() - 1}"
            p6 = nn.Conv(
                self.out_channels, (3, 3), strides=2, padding=1, dtype=self.dtype,
                param_dtype=jnp.float32, kernel_init=c2_xavier_fill, name="top_p6",
            )(p_top)
            p7 = nn.Conv(
                self.out_channels, (3, 3), strides=2, padding=1, dtype=self.dtype,
                param_dtype=jnp.float32, kernel_init=c2_xavier_fill, name="top_p7",
            )(nn.relu(p6))
            results[n6] = p6
            results[n7] = p7
        elif self.top_block is not None:
            raise ValueError(self.top_block)
        return results
