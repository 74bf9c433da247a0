"""Space-to-depth stem: run the full-resolution DLA stem convs in a 2x2
space-to-depth domain for MXU efficiency.

Why: the DLA stem (base_layer 7x7/s1 on 3 channels, level0 3x3/s1 on 16,
level1's first 3x3/s2) runs at full input resolution with 3-32 channels —
a tiny fraction of the 128-lane MXU is used and the ops are HBM-bound.
Re-expressing those convs over `space_to_depth(x, 2)` quadruples the channel
dimension (3->12, 16->64) and quarters the spatial extent, the classic TPU
restructuring (used by MLPerf ResNet). The transformation is EXACT: the
original conv weights are re-indexed into an equivalent kernel over the s2d
layout at apply time, so

- the parameter tree is byte-identical to the plain stem (same `conv/kernel`
  shapes, same `norm` BatchNorm parameters) — checkpoints and the torch
  converter are unaffected;
- outputs equal the plain stem up to dtype rounding (see
  tests/test_s2d_stem.py for the equivalence oracle);
- BatchNorm train-mode statistics are computed over (batch, space, phase) per
  ORIGINAL channel, which is exactly the plain BN reduction set, so training
  behavior is also unchanged.

Reference stem being restructured: tridet/modeling/feature_extractor/dla.py
:250-355 (base_layer + level0/level1 conv stacks). This file is a pure TPU
performance rewrite with no reference analogue.
"""
from typing import Any, Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from dd3d_tpu.models.layers import FrozenBatchNorm, kaiming_normal_fan_out


def space_to_depth(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/f, W/f, f*f*C); channel packing (py, px, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // factor, w // factor, factor * factor * c)


def depth_to_space(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    b, h, w, c4 = x.shape
    c = c4 // (factor * factor)
    x = x.reshape(b, h, w, factor, factor, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * factor, w * factor, c)


def _s2d_indices_stride1(k: int):
    """Index map for a stride-1, symmetric-pad conv re-expressed over s2d(2).

    Original: out[2i+py] = sum_ky w[ky] * in[2i+py+ky-p], p = (k-1)//2.
    s2d:      out'[i+u-P] covers it with ky = 2u + q - py + (p - 2P),
              window K = p + 2, P = (K-1)//2 (=> p - 2P = -1 for odd k).
    Returns (flat tap index array [K,K,2,2,2,2] over (u,v,qy,qx,py,px), mask).
    """
    p = (k - 1) // 2
    K = p + 2
    u = np.arange(K)
    q = np.arange(2)
    ph = np.arange(2)
    # ky[u, qy, py]
    ky = 2 * u[:, None, None] + q[None, :, None] - ph[None, None, :] - 1
    ok_y = (ky >= 0) & (ky < k)
    kyc = np.clip(ky, 0, k - 1)
    # broadcast to [u, v, qy, qx, py, px]
    kyb = kyc[:, None, :, None, :, None]
    kxb = kyc[None, :, None, :, None, :]
    mask = ok_y[:, None, :, None, :, None] & ok_y[None, :, None, :, None, :]
    flat, mask = np.broadcast_arrays(kyb * k + kxb, mask)
    return K, flat, mask


def s2d_weights_stride1(w: jnp.ndarray):
    """(k, k, ci, co) stride-1 conv kernel -> (K, K, 4*ci, 4*co) s2d kernel.

    Input channel packing (qy, qx, ci); output packing (py, px, co), matching
    `space_to_depth`. Padding of the s2d conv must be P = (K-1)//2 symmetric.
    """
    k, _, ci, co = w.shape
    K, flat, mask = _s2d_indices_stride1(k)
    wf = w.reshape(k * k, ci, co)
    big = wf[flat] * jnp.asarray(mask[..., None, None], dtype=w.dtype)
    # [u, v, qy, qx, py, px, ci, co] -> [u, v, qy, qx, ci, py, px, co]
    big = big.transpose(0, 1, 2, 3, 6, 4, 5, 7)
    return big.reshape(K, K, 4 * ci, 4 * co)


def s2d_weights_exit2(w: jnp.ndarray):
    """(3, 3, ci, co) stride-2 symmetric-pad conv -> (2, 2, 4*ci, co) s2d
    kernel with explicit padding ((1, 0), (1, 0)); output is in the plain
    layout at half resolution (the conv *exits* the s2d domain).

    out[oy] = sum_ky w[ky] * in[2*oy + ky - 1]; s2d row r=oy+u-1, phase q:
    2r + q = 2*oy + ky - 1 => ky = 2u + q - 1.
    """
    k, _, ci, co = w.shape
    assert k == 3, "exit conv must be 3x3 stride 2"
    u = np.arange(2)
    q = np.arange(2)
    ky = 2 * u[:, None] + q[None, :] - 1  # [u, q]
    ok = (ky >= 0) & (ky < k)
    kyc = np.clip(ky, 0, k - 1)
    kyb = kyc[:, None, :, None]
    kxb = kyc[None, :, None, :]
    mask = ok[:, None, :, None] & ok[None, :, None, :]
    flat = kyb * k + kxb  # [u, v, qy, qx]
    wf = w.reshape(k * k, ci, co)
    big = wf[flat] * jnp.asarray(mask[..., None, None], dtype=w.dtype)
    # [u, v, qy, qx, ci, co]
    return big.reshape(2, 2, 4 * ci, co)


class _Kernel(nn.Module):
    """Declares a conv kernel param identically to `nn.Conv` (name `kernel`
    under a module named `conv`), so the param tree matches `ConvNorm`."""

    shape: tuple
    kernel_init: Callable = kaiming_normal_fan_out

    @nn.compact
    def __call__(self):
        return self.param("kernel", self.kernel_init, self.shape, jnp.float32)


class _TiledBatchNorm(nn.Module):
    """BatchNorm over an s2d tensor whose channels are `tile` phase copies of
    `features` original channels. Parameters/statistics are declared exactly
    like `nn.BatchNorm` (params `scale`/`bias`; batch_stats `mean`/`var`, all
    shaped (features,)), and train-mode stats reduce over (B, H, W, phase) —
    the same reduction set as plain BN on the un-s2d tensor."""

    features: int
    tile: int = 4
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda *_: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda *_: jnp.ones((self.features,), jnp.float32)
        )
        if train:
            xr = x.astype(jnp.float32).reshape(-1, self.tile, self.features)
            mean = xr.mean(axis=(0, 1))
            mean2 = jnp.square(xr).mean(axis=(0, 1))
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = scale / jnp.sqrt(var + self.epsilon)
        add = bias - mean * mul
        mul_t = jnp.tile(mul, self.tile)
        add_t = jnp.tile(add, self.tile)
        return (x.astype(jnp.float32) * mul_t + add_t).astype(self.dtype)


class _TiledFrozenBN(nn.Module):
    """FrozenBatchNorm applied over phase-tiled channels (param tree matches
    `FrozenBatchNorm`: batch_stats scale/bias/mean/var, shaped (features,))."""

    features: int
    tile: int = 4
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.variable("batch_stats", "scale", nn.initializers.ones, None, (self.features,), jnp.float32)
        bias = self.variable("batch_stats", "bias", nn.initializers.zeros, None, (self.features,), jnp.float32)
        mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (self.features,), jnp.float32)
        var = self.variable("batch_stats", "var", nn.initializers.ones, None, (self.features,), jnp.float32)
        mul = scale.value / jnp.sqrt(var.value + self.epsilon)
        add = bias.value - mean.value * mul
        return (x.astype(jnp.float32) * jnp.tile(mul, self.tile) + jnp.tile(add, self.tile)).astype(self.dtype)


class S2DConvNorm(nn.Module):
    """Drop-in replacement for a stem `ConvNorm` operating in the s2d domain.

    mode:
      "s1"    — original stride-1 conv; input and output stay in s2d layout.
      "exit2" — original stride-2 conv; input in s2d layout, output plain.
    The declared parameters (conv/kernel + norm) are identical in name and
    shape to the plain `ConvNorm`, only the applied kernel is transformed.
    """

    features: int
    kernel_size: int
    mode: str = "s1"
    norm: str = "BN"
    dtype: Any = jnp.bfloat16
    kernel_init: Callable = kaiming_normal_fan_out

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm in ("", None):
            raise NotImplementedError("s2d stem requires a norm (no-bias convs)")
        cin = x.shape[-1] // 4  # input always arrives in s2d layout
        w = _Kernel(
            shape=(self.kernel_size, self.kernel_size, cin, self.features),
            kernel_init=self.kernel_init,
            name="conv",
        )()
        if self.mode == "s1":
            wt = s2d_weights_stride1(w)
            pad = ((wt.shape[0] - 1) // 2,) * 2
            padding = (pad, pad)
        elif self.mode == "exit2":
            assert self.kernel_size == 3
            wt = s2d_weights_exit2(w)
            padding = ((1, 0), (1, 0))
        else:
            raise ValueError(self.mode)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            wt.astype(self.dtype),
            window_strides=(1, 1),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        tile = 4 if self.mode == "s1" else 1
        if self.norm == "BN":
            if tile == 1:
                norm = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name="norm",
                )
                y = norm(y)
            else:
                y = _TiledBatchNorm(features=self.features, tile=tile, dtype=self.dtype, name="norm")(y, train)
        elif self.norm == "FrozenBN":
            if tile == 1:
                y = FrozenBatchNorm(features=self.features, dtype=self.dtype, name="norm")(y)
            else:
                y = _TiledFrozenBN(features=self.features, tile=tile, dtype=self.dtype, name="norm")(y)
        elif self.norm in ("", None):
            pass
        else:
            raise NotImplementedError(self.norm)
        return y
