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


# ---------------------------------------------------------------------------
# Guard-banded batch fold: run the whole stem on ONE (1, B*(H+G), W, C)
# canvas instead of (B, H, W, C).
#
# Why: for the stem's weight-gradient convolutions XLA picks BATCH-minor
# layouts (e.g. bf16[40,192,640,12]{0,3,2,1} — batch on the 128-lane axis,
# padded 40->128), inflating HBM traffic and MXU occupancy ~3.2x; the
# [5,5,12,64] stem dW alone measured 11.5 ms/step at batch 40 (~2% MFU,
# xplane trace in ROADMAP round-4). With batch folded into rows the batch
# dim is gone and lanes carry W=640 exactly.
#
# Exactness: stride-1 convs with symmetric zero padding P read at most P
# rows across an image boundary; G >= P zero guard rows between images
# reproduce the per-image zero-padding semantics exactly. Conv outputs AT
# guard rows read real rows of adjacent images, so they are garbage —
# they are masked to zero before BN (so batch statistics see exact zeros)
# and the statistics are rescaled by the exact valid-row fraction
# H/(H+G); the post-relu mask re-zeroes the guard rows (BN bias + relu
# make them non-zero constants) before they are read as padding by the
# next conv. Oracle: tests/test_s2d_stem.py fold parametrizations.
# ---------------------------------------------------------------------------


def s2d4_to_s2d2(x: jnp.ndarray) -> jnp.ndarray:
    """Repack an s2d(4) tensor (B, H/4, W/4, 16c) into the equivalent
    s2d(2) tensor (B, H/2, W/2, 4c).

    Phase algebra: global row 4i + py with py = 2*ay + by is s2d(2) row
    r = 2i + ay with row-phase by (same for columns), so the (py, px, c)
    channel packing splits into (ay, by, ax, bx, c) and (ay, ax) move back
    into the spatial grid. Property: s2d4_to_s2d2(space_to_depth(x, 4)) ==
    space_to_depth(x, 2) (tests/test_s2d_stem.py)."""
    b, h, w, c16 = x.shape
    c = c16 // 16
    x = x.reshape(b, h, w, 2, 2, 2, 2, c)  # (ay, by, ax, bx, c)
    x = x.transpose(0, 1, 3, 2, 5, 4, 6, 7)  # (b, h, ay, w, ax, by, bx, c)
    return x.reshape(b, 2 * h, 2 * w, 4 * c)


def fold_batch_rows(x: jnp.ndarray, guard: int) -> jnp.ndarray:
    """(B, H, W, C) -> (1, B*(H+guard), W, C) with `guard` zero rows
    appended after each image."""
    b, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, guard), (0, 0), (0, 0)))
    return x.reshape(1, b * (h + guard), w, c)


def unfold_batch_rows(x: jnp.ndarray, batch: int, guard: int) -> jnp.ndarray:
    """Inverse of fold_batch_rows (discards the guard rows)."""
    _, r, w, c = x.shape
    hp = r // batch
    return x.reshape(batch, hp, w, c)[:, : hp - guard]


def fold_row_mask(batch: int, h: int, guard: int) -> jnp.ndarray:
    """(1, B*(H+guard), 1, 1) float32 {0,1} mask of the valid (image) rows."""
    valid = (np.arange(batch * (h + guard)) % (h + guard)) < h
    return jnp.asarray(valid[None, :, None, None], jnp.float32)


def _s2d_indices_stride1(k: int, f: int = 2):
    """Index map for a stride-1, symmetric-pad conv re-expressed over s2d(f).

    Original: out[f*i+py] = sum_ky w[ky] * in[f*i+py+ky-p], p = (k-1)//2.
    s2d:      out'[i+u-P] covers it with ky = f*u + q - py + (p - f*P);
              we use P = (p+1)/f (requires (p+1) % f == 0, true for the
              7x7/f=4 and all odd-k/f=2 cases) so the offset is -1, with
              window K = (k+f-1)//f + 1.
    Returns (window K, flat tap index array [K,K,f,f,f,f] over
    (u,v,qy,qx,py,px), mask).
    """
    p = (k - 1) // 2
    if (p + 1) % f != 0:
        raise ValueError(f"s2d(f={f}) needs (pad+1) % f == 0 for k={k}")
    K = (k + f - 1) // f + 1
    assert K % 2 == 1, (k, f, K)  # symmetric-pad window
    u = np.arange(K)
    q = np.arange(f)
    ph = np.arange(f)
    # ky[u, qy, py]
    ky = f * u[:, None, None] + q[None, :, None] - ph[None, None, :] - 1
    ok_y = (ky >= 0) & (ky < k)
    kyc = np.clip(ky, 0, k - 1)
    # broadcast to [u, v, qy, qx, py, px]
    kyb = kyc[:, None, :, None, :, None]
    kxb = kyc[None, :, None, :, None, :]
    mask = ok_y[:, None, :, None, :, None] & ok_y[None, :, None, :, None, :]
    flat, mask = np.broadcast_arrays(kyb * k + kxb, mask)
    return K, flat, mask


def s2d_weights_stride1(w: jnp.ndarray, f: int = 2):
    """(k, k, ci, co) stride-1 conv kernel -> (K, K, f²*ci, f²*co) s2d(f)
    kernel.

    Input channel packing (qy, qx, ci); output packing (py, px, co), matching
    `space_to_depth`. Padding of the s2d conv must be P = (K-1)//2 symmetric.
    """
    k, _, ci, co = w.shape
    K, flat, mask = _s2d_indices_stride1(k, f)
    wf = w.reshape(k * k, ci, co)
    big = wf[flat] * jnp.asarray(mask[..., None, None], dtype=w.dtype)
    # [u, v, qy, qx, py, px, ci, co] -> [u, v, qy, qx, ci, py, px, co]
    big = big.transpose(0, 1, 2, 3, 6, 4, 5, 7)
    return big.reshape(K, K, f * f * ci, f * f * co)


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
    # Fraction of rows that are real image rows when the input is a
    # guard-banded batch-folded canvas whose guard rows are exactly zero
    # (fold_batch_rows); 1.0 = plain input. Zero guard rows contribute
    # nothing to sum(x) / sum(x^2), so dividing the raw means by this
    # fraction recovers the exact per-image statistics.
    valid_frac: float = 1.0

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
            # stats at least fp32 (bf16 inputs upcast; f64 stays f64)
            stat_dt = jnp.promote_types(x.dtype, jnp.float32)
            xr = x.astype(stat_dt).reshape(-1, self.tile, self.features)
            inv_vf = 1.0 / float(self.valid_frac)
            mean = xr.mean(axis=(0, 1)) * inv_vf
            mean2 = jnp.square(xr).mean(axis=(0, 1)) * inv_vf
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
    # space-to-depth factor (mode "s1" only; "exit2" is f=2-specific).
    factor: int = 2
    # Valid-row fraction for batch-folded canvases (see fold_batch_rows);
    # 1.0 = plain (B, H, W, C) input.
    valid_frac: float = 1.0
    # mode "s1" only: route the conv through ops/pallas_conv.conv2d_s1_same
    # so the weight gradient uses the Pallas slab kernel (forward and dx
    # stay on XLA's emitter). See TPU.PALLAS_STEM_DW.
    pallas_dw: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, row_mask: Optional[jnp.ndarray] = None):
        if self.norm in ("", None):
            raise NotImplementedError("s2d stem requires a norm (no-bias convs)")
        f2 = self.factor * self.factor
        cin = x.shape[-1] // f2  # input always arrives in s2d layout
        w = _Kernel(
            shape=(self.kernel_size, self.kernel_size, cin, self.features),
            kernel_init=self.kernel_init,
            name="conv",
        )()
        if self.mode == "s1":
            wt = s2d_weights_stride1(w, self.factor)
            pad = ((wt.shape[0] - 1) // 2,) * 2
            padding = (pad, pad)
        elif self.mode == "exit2":
            assert self.kernel_size == 3 and self.factor == 2
            wt = s2d_weights_exit2(w)
            padding = ((1, 0), (1, 0))
        else:
            raise ValueError(self.mode)
        if self.pallas_dw and self.mode == "s1":
            from dd3d_tpu.ops.pallas_conv import conv2d_s1_same

            y = conv2d_s1_same(x.astype(self.dtype), wt.astype(self.dtype),
                               jax.default_backend() != "tpu")
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                wt.astype(self.dtype),
                window_strides=(1, 1),
                padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if row_mask is not None:
            # Guard-row conv outputs read rows of two adjacent images —
            # zero them so the BN statistics below see exact zeros there.
            y = y * row_mask.astype(y.dtype)
        tile = f2 if self.mode == "s1" else 1
        if self.norm == "BN":
            if tile == 1 and self.valid_frac == 1.0:
                norm = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=self.dtype, name="norm",
                )
                y = norm(y)
            else:
                y = _TiledBatchNorm(
                    features=self.features, tile=tile, dtype=self.dtype,
                    valid_frac=self.valid_frac, name="norm",
                )(y, train)
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
