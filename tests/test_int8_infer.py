"""Opt-in int8 PTQ inference (layers.QUANT_INT8): dynamic-PTQ int8 convs for
every norm-folded eval conv. Pins (a) single-conv quantization error against
an exact int-arithmetic oracle bound, (b) that the quantized full model still
produces close detections (scores/boxes drift bounded), (c) that the int8
path only engages where a folded affine is present (predictors stay fp)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import dd3d_tpu.models.layers as L


def _rand_stats(rng, c):
    return {
        "scale": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(c).astype(np.float32)),
        "mean": jnp.asarray(rng.randn(c).astype(np.float32)),
        "var": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
    }


@pytest.mark.parametrize("strides,groups", [(1, 1), (2, 1), (1, 4)])
def test_int8_convnorm_close_to_fp32(monkeypatch, strides, groups):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))

    def build_apply(quant):
        monkeypatch.setattr(L, "QUANT_INT8", quant)
        m = L.ConvNorm(8, kernel_size=3, strides=strides, groups=groups,
                       norm="FrozenBN", dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        stats = _rand_stats(np.random.RandomState(1), 8)
        v = {"params": v["params"], "batch_stats": {"norm": stats}}
        return np.asarray(m.apply(v, x))

    a = build_apply(False)
    b = build_apply(True)
    # Dynamic per-tensor act + per-channel weight scales: worst-case error
    # per output ~ (|x|max/254) * sum|w| + (|w|max/254) * sum|x| over the
    # receptive field; empirically rel err is ~1e-2 at these sizes.
    denom = np.maximum(np.abs(a), np.percentile(np.abs(a), 50))
    rel = np.abs(a - b) / denom
    assert np.mean(rel) < 0.02, np.mean(rel)
    assert np.max(np.abs(a - b)) < 0.25 * np.abs(a).max()


def test_int8_exactness_int_grid(monkeypatch):
    """Inputs/weights already on the int8 grid -> the quantized conv is EXACT
    (int accumulation introduces no rounding)."""
    monkeypatch.setattr(L, "QUANT_INT8", True)
    rng = np.random.RandomState(2)
    xi = rng.randint(-127, 128, size=(1, 8, 8, 4)).astype(np.float32)
    xi[0, 0, 0, 0] = 127.0  # pin the dynamic act scale to exactly 1
    wi = rng.randint(-127, 128, size=(3, 3, 4, 6)).astype(np.float32)
    wi[0, 0, 0, :] = 127.0  # pin every per-channel weight scale to 1/127
    wf = wi / 127.0
    y = L._int8_conv(
        jnp.asarray(xi), jnp.asarray(wf),
        strides=(1, 1), padding=[(1, 1), (1, 1)], rhs_dilation=(1, 1), groups=1,
        out_dtype=jnp.float32,
    )
    # Oracle: plain fp32 conv of the same operands.
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(xi), jnp.asarray(wf), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-6, atol=1e-4)


def test_int8_only_engages_on_folded_convs(monkeypatch):
    """A norm-free ConvNorm (bias conv, e.g. FPN lateral) must be bit-identical
    with the flag on — the int8 branch requires a folded affine."""
    monkeypatch.setattr(L, "QUANT_INT8", True)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 8, 8).astype(np.float32))
    m = L.ConvNorm(8, kernel_size=3, norm="", dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    a = np.asarray(m.apply(v, x))
    monkeypatch.setattr(L, "QUANT_INT8", False)
    b = np.asarray(m.apply(v, x))
    np.testing.assert_array_equal(a, b)


def test_int8_full_model_detections_close(monkeypatch):
    """DD3D-DLA34 eval graph, bf16 vs int8: decoded detections stay close on
    random weights/images (the PTQ acceptance smoke; real-data AP A/B is the
    data-gated follow-up)."""
    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.models import build_model
    from dd3d_tpu.models.dd3d import dd3d_inference

    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32) * 255)
    intr = jnp.asarray(
        np.tile(np.array([[120.0, 0, 64.0], [0, 120.0, 64.0], [0, 0, 1]], np.float32), (2, 1, 1))
    )
    variables = model.init(jax.random.PRNGKey(0), images, train=False)

    def run(quant):
        monkeypatch.setattr(L, "QUANT_INT8", quant)
        out = model.apply(variables, images, train=False)
        return dd3d_inference(cfg, out, intr)

    a = run(False)
    b = run(True)
    sa = np.sort(np.asarray(a["scores"]).ravel())[::-1][:50]
    sb = np.sort(np.asarray(b["scores"]).ravel())[::-1][:50]
    # Same score mass; random-weight logits sit near sigmoid's steep region,
    # so per-detection drift is the right thing to bound, not equality.
    assert np.mean(np.abs(sa - sb)) < 0.05, np.mean(np.abs(sa - sb))
    assert abs(float(sa.sum()) - float(sb.sum())) / max(float(sa.sum()), 1e-6) < 0.25
