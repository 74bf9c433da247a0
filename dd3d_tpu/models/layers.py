"""Building-block layers: conv+norm+act, frozen BN, learnable Scale/Offset.

Rebuilds the roles of detectron2's `Conv2d/get_norm` and
`tridet/layers/normalization.py` (Scale, Offset, ModuleListDial) in flax.

TPU-first choices:
- NHWC layout everywhere (native for TPU convolutions).
- Compute dtype bf16 with fp32 params (`dtype` / `param_dtype`); normalization
  statistics and residual adds stay fp32 via flax's promotion rules.
- `ModuleListDial`'s hidden round-robin state (normalization.py:30-40) is
  replaced by EXPLICIT per-level norm indexing: the caller passes `level` and
  the module holds one norm per FPN level.
"""
from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

# kaiming_normal(fan_out) == caffe2 "MSRAFill", used for backbone + towers
# (tridet/modeling/feature_extractor/dla.py:296-297, fcos2d.py:118-122).
kaiming_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# kaiming_uniform(a=1): gain = 2 / (1 + a^2) = 1.0, fan_in, uniform — used for
# predictor convs (fcos2d.py:124-130, fcos3d.py:152-160).
kaiming_uniform_a1 = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


class FrozenBatchNorm(nn.Module):
    """BatchNorm with permanently frozen statistics and affine parameters.

    Equivalent to detectron2's FrozenBatchNorm2d: scale/bias/mean/var all live
    in the (non-trainable) `batch_stats` collection, so the optimizer never
    touches them; values come from init (identity) or a converted checkpoint.
    """

    features: int
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.variable("batch_stats", "scale", nn.initializers.ones, None, (self.features,), jnp.float32)
        bias = self.variable("batch_stats", "bias", nn.initializers.zeros, None, (self.features,), jnp.float32)
        mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (self.features,), jnp.float32)
        var = self.variable("batch_stats", "var", nn.initializers.ones, None, (self.features,), jnp.float32)
        # Fold to (mul, add) in fp32 (per-channel, cheap), then apply in the
        # ACTIVATION dtype — exactly detectron2's FrozenBatchNorm2d, which
        # casts scale/bias down with `.to(x.dtype)` before the multiply.
        # The previous fp32 upcast of the whole activation forced separate
        # full-resolution convert+affine passes (23 ms/step at batch 40 on
        # the [B,384,1280,16] stem tensors alone, xplane trace in ROADMAP);
        # in x.dtype the affine fuses into the producing conv's epilogue.
        mul = scale.value / jnp.sqrt(var.value + self.epsilon)
        add = bias.value - mean.value * mul
        return (x * mul.astype(x.dtype) + add.astype(x.dtype)).astype(self.dtype)


def make_norm(norm: str, features: int, dtype=jnp.float32, name: Optional[str] = None):
    """Norm factory mirroring detectron2 `get_norm` for the subset the
    reference uses: BN / FrozenBN / '' (none)."""
    if norm == "BN":
        return nn.BatchNorm(
            use_running_average=None,  # set via __call__
            momentum=0.9,
            epsilon=1e-5,
            dtype=dtype,
            name=name,
        )
    if norm == "FrozenBN":
        return FrozenBatchNorm(features=features, dtype=dtype, name=name)
    if norm in ("", None):
        return None
    raise NotImplementedError(f"Norm {norm!r}")


class ConvNorm(nn.Module):
    """Conv -> norm -> activation, like detectron2's Conv2d wrapper.

    bias is enabled iff there is no norm, matching the reference convention
    (e.g. tridet/modeling/feature_extractor/dla.py:28-47).
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    groups: int = 1
    norm: str = "BN"
    activation: Optional[Callable] = None
    use_bias: Optional[bool] = None  # default: no norm -> bias
    dtype: Any = jnp.bfloat16
    kernel_init: Callable = kaiming_normal_fan_out

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.use_bias if self.use_bias is not None else self.norm in ("", None)
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=self.strides,
            padding=[(self.dilation * (self.kernel_size - 1) // 2,) * 2] * 2,
            kernel_dilation=self.dilation,
            feature_group_count=self.groups,
            use_bias=use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init,
            name="conv",
        )(x)
        norm = make_norm(self.norm, self.features, dtype=self.dtype, name="norm")
        if norm is not None:
            if isinstance(norm, nn.BatchNorm):
                x = norm(x, use_running_average=not train)
            else:
                x = norm(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class Scale(nn.Module):
    """Learnable scalar multiplier (tridet/layers/normalization.py:12-18)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.constant(self.init_value), (1,), jnp.float32)
        return x * scale.astype(x.dtype)


class Offset(nn.Module):
    """Learnable scalar offset (tridet/layers/normalization.py:21-27)."""

    init_value: float = 0.0

    @nn.compact
    def __call__(self, x):
        bias = self.param("bias", nn.initializers.constant(self.init_value), (1,), jnp.float32)
        return x + bias.astype(x.dtype)


class PerLevelNorms(nn.Module):
    """One norm layer per FPN level, applied by explicit level index.

    Replaces `ModuleListDial` (tridet/layers/normalization.py:30-40), whose
    round-robin mutable state is hostile to functional tracing; here the call
    site passes the level index, which is static at trace time.
    """

    num_levels: int
    features: int
    norm: str = "BN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, level: int, train: bool = False):
        norm = make_norm(self.norm, self.features, dtype=self.dtype, name=f"norm{level}")
        if norm is None:
            return x
        if isinstance(norm, nn.BatchNorm):
            return norm(x, use_running_average=not train)
        return norm(x)
