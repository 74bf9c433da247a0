"""Device-side color jitter.

The reference applies brightness/saturation/contrast blends on host per
image (tridet/data/augmentations/color_transform.py; d2 blend semantics).
That costs ~24 ms/image of host CPU — on TPU the same three blends are
elementwise ops that XLA fuses straight into the input normalization, so the
mapper just samples the three blend weights and the compiled train step
applies them. Order and clipping match the host path exactly:
brightness -> saturation -> contrast, each clipped to [0, 255].
"""
import jax.numpy as jnp

# BGR grayscale weights (the reference uses RGB order on RGB images; ours are
# BGR, same weights reversed — identical to data/augmentations.py).
_GRAY_BGR = jnp.asarray([0.114, 0.587, 0.299], dtype=jnp.float32)


def apply_color_jitter(images: jnp.ndarray, factors: jnp.ndarray) -> jnp.ndarray:
    """images: (B, H, W, 3) float32 BGR in [0, 255];
    factors: (B, 3) = (brightness_w, saturation_w, contrast_w); weight 1 = identity."""
    images = images.astype(jnp.float32)
    wb = factors[:, 0][:, None, None, None]
    ws = factors[:, 1][:, None, None, None]
    wc = factors[:, 2][:, None, None, None]

    x = jnp.clip(images * wb, 0.0, 255.0)

    gray = (x @ _GRAY_BGR)[..., None]
    x = jnp.clip((1.0 - ws) * gray + ws * x, 0.0, 255.0)

    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = jnp.clip((1.0 - wc) * mean + wc * x, 0.0, 255.0)
    return x
