"""Static (calibrated) int8 PTQ: activation scales recorded by a calibration
pass become trace-time constants (TPU.QUANT_SCALES_PATH), deleting the
dynamic per-batch abs-max reduces. Pins (a) the capture mechanism (sown
abs-max per folded conv), (b) bit-exact equality static-vs-dynamic when
calibrated on the very batch being inferred, (c) closure-cache routing on
the scales-file content. cf. the inference path this accelerates,
tridet/modeling/dd3d/fcos2d.py:242-367."""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import dd3d_tpu.models.layers as L


def _small_cfg():
    from dd3d_tpu.configs import get_experiment_cfg

    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    cfg.FE.BACKBONE.NAME = "DLA-46-C"
    cfg.FE.BUILDER = "build_fcos_dla_fpn_backbone_p6"
    cfg.FE.OUT_FEATURES = ["p3", "p4", "p5", "p6"]
    cfg.FE.FPN.OUT_CHANNELS = 64
    cfg.DD3D.FCOS2D.NUM_CLS_CONVS = 1
    cfg.DD3D.FCOS2D.NUM_BOX_CONVS = 1
    cfg.DD3D.FCOS3D.NUM_CONVS = 1
    cfg.FE.BACKBONE.NORM = "FrozenBN"  # folded convs at eval AND train
    cfg.TPU.QUANT_INT8 = True
    cfg.TPU.QUANT_MIN_CH = 0
    return cfg


@pytest.fixture(scope="module")
def built():
    cfg = _small_cfg()
    from dd3d_tpu.models import build_model

    model = build_model(cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32) * 255)
    intr = jnp.asarray(
        np.tile(np.array([[120.0, 0, 64.0], [0, 120.0, 64.0], [0, 0, 1]], np.float32), (2, 1, 1))
    )
    variables = model.init(jax.random.PRNGKey(0), images, train=False)
    return cfg, model, images, intr, variables


def _capture(cfg, model, variables, images):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from calibrate_int8 import capture_scales

    return capture_scales(cfg, model, variables, [images])


def test_capture_covers_every_folded_conv(built):
    cfg, model, images, _, variables = built
    scales = _capture(cfg, model, variables, images)
    # Every scale entry carries a matching shape-tag entry (the checked
    # call-order invariant, models/layers.py QUANT_TAGS).
    tags = scales.pop("__tags__")
    assert set(tags) == set(scales)
    assert all(len(tags[k]) == len(scales[k]) for k in scales)
    # DLA-46-C backbone + FPN norms + head towers: every ConvNorm with a
    # norm contributes one folded conv; predictors (norm-free) must not.
    assert len(scales) > 20, sorted(scales)
    assert all(x > 0 for v in scales.values() for x in v)
    # shared tower convs record one scale PER CALL (= per FPN level)
    n_levels = len(cfg.FE.OUT_FEATURES)
    tower = [k for k in scales if k.startswith(("fcos2d_head/", "fcos3d_head/")) and "tower" in k]
    assert tower and all(len(scales[k]) == n_levels for k in tower), {
        k: len(scales[k]) for k in tower
    }
    # paths are the scope paths the static lookup uses: backbone + heads
    assert any(k.startswith("backbone/") for k in scales)
    assert any(k.startswith("fcos2d_head/") for k in scales)


def test_static_equals_dynamic_eager_exact(built, monkeypatch):
    """Per-call mechanism pin: calibrating on batch X (eagerly) and statically
    re-running X (eagerly) reproduces the dynamic-PTQ result BIT-EXACTLY —
    the recorded per-call abs-max IS the dynamic scale, _int8_conv's static
    branch uses identical f32 arithmetic, and the trace-time call counter
    lines up with sow order. (Eager on both sides: across *different jitted
    programs* XLA fusion changes bf16 intermediate rounding by ±1 ulp, which
    legitimately shifts dynamic scales — that path is covered by the
    closeness test below.)"""
    cfg, model, images, _, variables = built
    from flax import traverse_util

    monkeypatch.setattr(L, "QUANT_INT8", True)
    monkeypatch.setattr(L, "QUANT_MIN_CH", 0)
    monkeypatch.setattr(L, "QUANT_SCALES", {})
    monkeypatch.setattr(L, "QUANT_CALL_COUNTS", {})
    dyn, inter = model.apply(variables, images, train=False, mutable=["intermediates"])
    scales = {
        "/".join(k[:-1]): tuple(float(x) for x in v)
        for k, v in traverse_util.flatten_dict(inter["intermediates"]).items()
        if k[-1] == "act_amax"
    }
    assert scales

    monkeypatch.setattr(L, "QUANT_SCALES", scales)
    monkeypatch.setattr(L, "QUANT_CALL_COUNTS", {})
    sta = model.apply(variables, images, train=False)
    for key in dyn:
        for lvl, (a, b) in enumerate(zip(dyn[key], sta[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f"{key}[{lvl}]")


def test_static_close_to_dynamic_jitted(built, tmp_path):
    """Deployment shape: jitted static-PTQ detections stay close to jitted
    dynamic-PTQ (drift = one quantization step per conv + bf16 fusion ulps,
    same acceptance bound family as tests/test_int8_infer.py)."""
    cfg, model, images, intr, variables = built
    from dd3d_tpu.models.dd3d import dd3d_inference

    scales = _capture(cfg, model, variables, images)

    def run(scales_path):
        cfg2 = cfg.clone()
        cfg2.TPU.QUANT_SCALES_PATH = scales_path

        @jax.jit
        def f(v, im, k):
            L.set_quant_from_cfg(cfg2)
            return dd3d_inference(cfg2, model.apply(v, im, train=False), k)

        out = jax.device_get(f(variables, images, intr))
        L.set_quant_from_cfg(_plain_cfg())  # reset trace-time globals
        return out

    dyn = run("")
    p = tmp_path / "scales.json"
    p.write_text(json.dumps(scales))
    sta = run(str(p))
    sa = np.sort(np.asarray(dyn["scores"]).ravel())[::-1][:50]
    sb = np.sort(np.asarray(sta["scores"]).ravel())[::-1][:50]
    assert np.mean(np.abs(sa - sb)) < 0.05, np.mean(np.abs(sa - sb))
    assert abs(float(sa.sum()) - float(sb.sum())) / max(float(sa.sum()), 1e-6) < 0.25


def _plain_cfg():
    from dd3d_tpu.configs import get_experiment_cfg

    return get_experiment_cfg("dd3d_kitti_dla34")


def test_partial_scales_fall_back_to_dynamic(built, monkeypatch):
    """Paths missing from QUANT_SCALES keep the dynamic scale: a file with
    only SOME convs still runs (and still equals full-dynamic when the
    provided scales are the observed maxes)."""
    cfg, model, images, intr, variables = built
    from dd3d_tpu.models.dd3d import dd3d_inference

    from flax import traverse_util

    monkeypatch.setattr(L, "QUANT_INT8", True)
    monkeypatch.setattr(L, "QUANT_MIN_CH", 0)
    monkeypatch.setattr(L, "QUANT_SCALES", {})
    monkeypatch.setattr(L, "QUANT_CALL_COUNTS", {})
    out, inter = model.apply(variables, images, train=False, mutable=["intermediates"])
    dyn = jax.device_get(dd3d_inference(cfg, out, intr))
    scales = {
        "/".join(k[:-1]): tuple(float(x) for x in v)
        for k, v in traverse_util.flatten_dict(inter["intermediates"]).items()
        if k[-1] == "act_amax"
    }
    partial = dict(list(sorted(scales.items()))[::2])  # every other conv

    monkeypatch.setattr(L, "QUANT_SCALES", partial)
    monkeypatch.setattr(L, "QUANT_CALL_COUNTS", {})
    mix = jax.device_get(dd3d_inference(cfg, model.apply(variables, images, train=False), intr))
    for k in dyn:
        np.testing.assert_array_equal(dyn[k], mix[k], err_msg=k)


def test_tag_mismatch_falls_back_to_dynamic(built, monkeypatch):
    """The call-index invariant is CHECKED (VERDICT r4): permuting the
    calibrated shape tags (simulating a reordered tower call pattern, or a
    different serving canvas) must (a) record mismatches, (b) fall back to
    the dynamic scale for exactly those calls — here calibrated-on-this-batch
    dynamic == static, so the output stays bit-exact while the program
    degrades to dynamic scales instead of applying wrong constants."""
    cfg, model, images, _, variables = built

    monkeypatch.setattr(L, "QUANT_INT8", True)
    monkeypatch.setattr(L, "QUANT_MIN_CH", 0)
    monkeypatch.setattr(L, "QUANT_SCALES", {})
    monkeypatch.setattr(L, "QUANT_CALL_COUNTS", {})
    monkeypatch.setattr(L, "QUANT_TAGS", {})
    monkeypatch.setattr(L, "QUANT_OBSERVED_TAGS", {})
    monkeypatch.setattr(L, "QUANT_TAG_MISMATCHES", [])
    from flax import traverse_util

    dyn, inter = model.apply(variables, images, train=False, mutable=["intermediates"])
    scales = {
        "/".join(k[:-1]): tuple(float(x) for x in v)
        for k, v in traverse_util.flatten_dict(inter["intermediates"]).items()
        if k[-1] == "act_amax"
    }
    true_tags = {k: tuple(v) for k, v in L.QUANT_OBSERVED_TAGS.items()}
    # Rotate per-call tags — multi-call (shared tower) paths now claim each
    # scale was calibrated on a different FPN level's shape.
    rotated = {k: v[1:] + v[:1] for k, v in true_tags.items()}
    multi = [k for k, v in true_tags.items() if len(set(v)) > 1]
    assert multi, "need shared tower convs with distinct per-level shapes"

    monkeypatch.setattr(L, "QUANT_SCALES", scales)
    monkeypatch.setattr(L, "QUANT_CALL_COUNTS", {})
    monkeypatch.setattr(L, "QUANT_TAGS", rotated)
    monkeypatch.setattr(L, "QUANT_TAG_MISMATCHES", [])
    out = model.apply(variables, images, train=False)
    assert L.QUANT_TAG_MISMATCHES, "rotated tags must be detected"
    assert {m[0] for m in L.QUANT_TAG_MISMATCHES} >= set(multi)
    for key in dyn:
        for lvl, (a, b) in enumerate(zip(dyn[key], out[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f"{key}[{lvl}]")

    # Control: the true tags pass clean (no mismatch, same bit-exact output).
    monkeypatch.setattr(L, "QUANT_CALL_COUNTS", {})
    monkeypatch.setattr(L, "QUANT_TAGS", true_tags)
    monkeypatch.setattr(L, "QUANT_TAG_MISMATCHES", [])
    out2 = model.apply(variables, images, train=False)
    assert not L.QUANT_TAG_MISMATCHES
    for key in dyn:
        for lvl, (a, b) in enumerate(zip(dyn[key], out2[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f"{key}[{lvl}]")


def test_scales_content_routes_through_inference_cache(built, tmp_path):
    """Two scale files at the SAME path (rewritten content) must yield
    distinct cached closures — constants are baked at trace time."""
    cfg, model, images, intr, variables = built
    import time

    from dd3d_tpu.models.postprocess import get_inference_fn

    scales = _capture(cfg, model, variables, images)
    p = tmp_path / "scales.json"

    p.write_text(json.dumps(scales))
    cfg_a = cfg.clone()
    cfg_a.TPU.QUANT_SCALES_PATH = str(p)
    fn_a = get_inference_fn(model, cfg_a, jit=True)
    a = np.asarray(fn_a(variables, images, intr)["scores"])

    time.sleep(0.01)
    doubled = {k: v if k == "__tags__" else [x * 4.0 for x in v] for k, v in scales.items()}
    p.write_text(json.dumps(doubled))
    import os

    os.utime(p, (os.path.getmtime(p) + 1, os.path.getmtime(p) + 1))
    fn_b = get_inference_fn(model, cfg_a.clone(), jit=True)
    assert fn_b is not fn_a
    b = np.asarray(fn_b(variables, images, intr)["scores"])
    assert not np.array_equal(a, b)  # 4x coarser scales actually engaged
