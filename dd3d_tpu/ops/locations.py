"""FCOS feature-location grids, rebuild of
`tridet/utils/tensor2d.py:compute_features_locations` (offset "none"/"half")."""
import jax.numpy as jnp


def compute_feature_locations(h: int, w: int, stride: int, offset: str = "none", dtype=jnp.float32) -> jnp.ndarray:
    """(h * w, 2) grid of (x, y) pixel coordinates, row-major over (y, x)."""
    shift_x = jnp.arange(0, w * stride, stride, dtype=dtype)
    shift_y = jnp.arange(0, h * stride, stride, dtype=dtype)
    sx, sy = jnp.meshgrid(shift_x, shift_y)  # each (h, w)
    locations = jnp.stack([sx.reshape(-1), sy.reshape(-1)], axis=1)
    if offset == "half":
        locations = locations + stride // 2
    elif offset != "none":
        raise ValueError(offset)
    return locations


def aligned_bilinear(x: jnp.ndarray, factor: int, offset: str = "none") -> jnp.ndarray:
    """Aligned bilinear upsample of NHWC tensors by an integer factor.

    Port of the semantics of tridet/utils/tensor2d.py:28-47 (replicate-pad one
    pixel, align_corners bilinear resize to factor*s + 1, crop).
    """
    assert factor >= 1 and int(factor) == factor
    if factor == 1:
        return x
    n, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    oh, ow = factor * h + 1, factor * w + 1
    # align_corners=True bilinear: sample grid maps [0, oh-1] -> [0, h].
    ys = jnp.linspace(0.0, float(h), oh)
    xs = jnp.linspace(0.0, float(w), ow)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w)
    y1 = jnp.clip(y0 + 1, 0, h)
    x1 = jnp.clip(x0 + 1, 0, w)
    wy = (ys - y0.astype(ys.dtype))[None, :, None, None]
    wx = (xs - x0.astype(xs.dtype))[None, None, :, None]

    g00 = x[:, y0][:, :, x0]
    g01 = x[:, y0][:, :, x1]
    g10 = x[:, y1][:, :, x0]
    g11 = x[:, y1][:, :, x1]
    out = (
        g00 * (1 - wy) * (1 - wx)
        + g01 * (1 - wy) * wx
        + g10 * wy * (1 - wx)
        + g11 * wy * wx
    )
    if offset == "half":
        out = jnp.pad(out, ((0, 0), (factor // 2, 0), (factor // 2, 0), (0, 0)), mode="edge")
    return out[:, : oh - 1, : ow - 1, :]
