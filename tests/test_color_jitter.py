import numpy as np
import jax.numpy as jnp

from dd3d_tpu.data.augmentations import BlendTransform, _LazyBlend
from dd3d_tpu.ops.color_jitter import apply_color_jitter


def test_device_jitter_matches_host(rng):
    """Device-side jitter must reproduce the host blend pipeline as applied
    to uint8 images in production (per-stage clip to [0, 255]; the device
    path skips the per-stage uint8 rounding, hence the ~2-count tolerance)."""
    img = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
    wb, ws, wc = 0.85, 1.15, 0.9

    # host path: brightness -> saturation -> contrast on uint8 (clips+rounds)
    x = BlendTransform(np.float32(0.0), 1 - wb, wb).apply_image(img)
    x = _LazyBlend(lambda im: im.astype(np.float32) @ np.float32([0.114, 0.587, 0.299])[:, None], ws).apply_image(x)
    x = _LazyBlend(lambda im: im.mean(), wc).apply_image(x)

    y = np.asarray(
        apply_color_jitter(jnp.asarray(img[None].astype(np.float32)), jnp.asarray([[wb, ws, wc]]))
    )[0]
    # three per-stage uint8 roundings compound through the blends; <4/255
    # intensity difference is immaterial for an augmentation.
    np.testing.assert_allclose(y, x.astype(np.float32), atol=4.0)


def test_identity_factors_noop(rng):
    img = (rng.rand(8, 8, 3) * 255).astype(np.float32)
    y = np.asarray(apply_color_jitter(jnp.asarray(img[None]), jnp.ones((1, 3), np.float32)))[0]
    np.testing.assert_allclose(y, img, atol=1e-4)
