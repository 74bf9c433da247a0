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

    monkeypatch.setattr(L, "QUANT_MIN_CH", 0)  # engage even on 8-ch convs

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
    monkeypatch.setattr(L, "QUANT_MIN_CH", 0)
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

    monkeypatch.setattr(L, "QUANT_MIN_CH", 0)  # quantize every folded conv

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


def test_quant_config_key_routes_through_inference_cache():
    """TPU.QUANT_INT8 as a config key (VERDICT r3): two configs differing
    only in the quant keys must get DISTINCT cached closures, each traced
    with its own setting — flipping the key mid-process must never serve a
    stale compiled program."""
    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.models import build_model
    from dd3d_tpu.models.postprocess import get_inference_fn

    cfg_off = get_experiment_cfg("dd3d_kitti_dla34")
    cfg_on = get_experiment_cfg("dd3d_kitti_dla34")
    cfg_on.TPU.QUANT_INT8 = True
    cfg_on.TPU.QUANT_MIN_CH = 0

    model = build_model(cfg_off)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32) * 255)
    intr = jnp.asarray(
        np.tile(np.array([[120.0, 0, 64.0], [0, 120.0, 64.0], [0, 0, 1]], np.float32), (1, 1, 1))
    )
    variables = model.init(jax.random.PRNGKey(0), images, train=False)

    fn_off = get_inference_fn(model, cfg_off, jit=True)
    fn_on = get_inference_fn(model, cfg_on, jit=True)
    assert fn_off is not fn_on  # distinct cache entries

    a = np.asarray(fn_off(variables, images, intr)["scores"])
    b = np.asarray(fn_on(variables, images, intr)["scores"])
    # Run the off closure again AFTER the on trace flipped the global:
    # it must reproduce its own (bf16) result, not the quantized one.
    a2 = np.asarray(fn_off(variables, images, intr)["scores"])
    np.testing.assert_array_equal(a, a2)
    assert not np.array_equal(a, b)  # the key actually engages the int8 path


def test_train_step_forces_quant_off():
    """The training graph must ignore TPU.QUANT_INT8: round() has zero
    gradient, so quantized convs would silently stop training."""
    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.models import build_model
    from dd3d_tpu.training.train_loop import create_train_state
    from dd3d_tpu.training.train_step import make_train_step

    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    cfg.FE.BACKBONE.NAME = "DLA-46-C"
    cfg.FE.BUILDER = "build_fcos_dla_fpn_backbone_p6"
    cfg.FE.OUT_FEATURES = ["p3", "p4", "p5", "p6"]
    cfg.FE.FPN.OUT_CHANNELS = 64
    cfg.DD3D.FCOS2D.NUM_CLS_CONVS = 1
    cfg.DD3D.FCOS2D.NUM_BOX_CONVS = 1
    cfg.DD3D.FCOS3D.NUM_CONVS = 1
    # FrozenBN everywhere so folded convs exist in the TRAIN graph too —
    # exactly the case where quantization would zero the backbone grads.
    cfg.FE.BACKBONE.NORM = "FrozenBN"
    cfg.TPU.QUANT_INT8 = True
    cfg.TPU.QUANT_MIN_CH = 0

    model = build_model(cfg)
    rng = np.random.RandomState(0)
    k = np.array([[700.0, 0, 32], [0, 700.0, 32], [0, 0, 1]], np.float32)
    batch = {
        "image": jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 255),
        "intrinsics": jnp.asarray(np.tile(k, (2, 1, 1))),
        "gt_boxes2d": jnp.asarray(np.tile(np.array([10, 10, 50, 45], np.float32), (2, 4, 1))),
        "gt_classes": jnp.zeros((2, 4), jnp.int32),
        "gt_boxes3d": jnp.asarray(
            np.tile(np.array([1, 0, 0, 0, 30, 28, 20, 1.6, 3.9, 1.5], np.float32), (2, 4, 1))
        ),
        "gt_valid": jnp.asarray(np.tile(np.arange(4)[None] < 2, (2, 1))),
    }
    state = create_train_state(cfg, model, batch)
    step = jax.jit(make_train_step(cfg, model))
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    # Backbone conv weights must have moved: grads reached through the convs.
    p0 = jax.tree_util.tree_leaves(state.params)
    p1 = jax.tree_util.tree_leaves(new_state.params)
    moved = sum(float(np.abs(np.asarray(a) - np.asarray(b)).max()) for a, b in zip(p0, p1))
    assert moved > 0.0


def test_quant_unfolded_gate(monkeypatch):
    """TPU.QUANT_UNFOLDED extends int8 to the norm-free predictor convs
    (layers.fused_predictor_apply). Default OFF: predictors bit-identical
    even with QUANT_INT8 on. ON: quantized, drift bounded like any PTQ
    conv."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 32).astype(np.float32))
    m = L.PredictorConv(6, 32, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    base = np.asarray(m.apply(v, x))

    monkeypatch.setattr(L, "QUANT_INT8", True)
    monkeypatch.setattr(L, "QUANT_MIN_CH", 0)
    off = np.asarray(m.apply(v, x))
    np.testing.assert_array_equal(base, off)  # QUANT_UNFOLDED defaults False

    monkeypatch.setattr(L, "QUANT_UNFOLDED", True)
    on = np.asarray(m.apply(v, x))
    assert not np.array_equal(base, on), "flag should engage the int8 path"
    denom = np.maximum(np.abs(base), np.percentile(np.abs(base), 50))
    assert np.mean(np.abs(base - on) / denom) < 0.02

    # Calibration sees the predictor too: sow emits an act_amax under the
    # module path so capture_scales/prepare_static_scales cover it.
    _, inter = m.apply(v, x, mutable=["intermediates"])
    flat = jax.tree_util.tree_leaves(inter)
    assert len(flat) == 1 and float(flat[0]) == pytest.approx(
        float(jnp.max(jnp.abs(x))))
