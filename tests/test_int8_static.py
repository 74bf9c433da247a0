"""Static (calibrated) int8 PTQ: activation scales recorded by a calibration
pass become trace-time constants (TPU.QUANT_SCALES_PATH), deleting the
dynamic per-batch abs-max reduces. Scales are keyed (conv_path, activation
shape tag) — no call-order assumption, and one merged file serves several
canvases (the TTA buckets). Pins (a) the capture mechanism (sown abs-max
per folded conv, tag-paired), (b) bit-exact equality static-vs-dynamic when
calibrated on the very batch being inferred, (c) safe dynamic fallback on
(path, tag) misses, (d) multi-canvas merge, (e) closure-cache routing on
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


def _capture(cfg, model, variables, image_batches):
    from dd3d_tpu.models.calibrate import capture_scales

    if not isinstance(image_batches, list):
        image_batches = [image_batches]
    return capture_scales(cfg, model, variables, image_batches)


def _eager_scales(model, variables, images):
    """Dynamic-PTQ eager pass; returns ({path: {tag: amax}}, outputs)."""
    from flax import traverse_util

    dyn, inter = model.apply(variables, images, train=False, mutable=["intermediates"])
    tags = {k: list(v) for k, v in L.QUANT_OBSERVED_TAGS.items()}
    scales = {}
    for k, v in traverse_util.flatten_dict(inter["intermediates"]).items():
        if k[-1] != "act_amax":
            continue
        path = "/".join(k[:-1])
        ent = scales.setdefault(path, {})
        for tag, amax in zip(tags.get(path, []), [float(x) for x in v]):
            ent[tag] = max(amax, ent.get(tag, 0.0))
    return scales, dyn


def test_capture_covers_every_folded_conv(built):
    cfg, model, images, _, variables = built
    scales = _capture(cfg, model, variables, images)
    # DLA-46-C backbone + FPN norms + head towers: every ConvNorm with a
    # norm contributes one folded conv; predictors (norm-free) must not.
    assert len(scales) > 20, sorted(scales)
    assert all(isinstance(v, dict) and v for v in scales.values())
    assert all(a > 0 for v in scales.values() for a in v.values())
    # shared tower convs record one scale PER LEVEL SHAPE (= per FPN level)
    n_levels = len(cfg.FE.OUT_FEATURES)
    tower = [k for k in scales if k.startswith(("fcos2d_head/", "fcos3d_head/")) and "tower" in k]
    assert tower and all(len(scales[k]) == n_levels for k in tower), {
        k: len(scales[k]) for k in tower
    }
    # tags are "HxWxC" of the conv input
    for k in tower:
        for t in scales[k]:
            h, w, c = (int(x) for x in t.split("x"))
            assert h > 0 and w > 0 and c > 0
    # paths are the scope paths the static lookup uses: backbone + heads
    assert any(k.startswith("backbone/") for k in scales)
    assert any(k.startswith("fcos2d_head/") for k in scales)


def test_static_equals_dynamic_eager_exact(built, monkeypatch):
    """Tag-keying mechanism pin: calibrating on batch X (eagerly) and
    statically re-running X (eagerly) reproduces the dynamic-PTQ result
    BIT-EXACTLY — the recorded abs-max IS the dynamic scale and
    _int8_conv's static branch uses identical f32 arithmetic. (Eager on
    both sides: across *different jitted programs* XLA fusion changes bf16
    intermediate rounding by ±1 ulp, which legitimately shifts dynamic
    scales — that path is covered by the closeness test below.)"""
    cfg, model, images, _, variables = built

    monkeypatch.setattr(L, "QUANT_INT8", True)
    monkeypatch.setattr(L, "QUANT_MIN_CH", 0)
    monkeypatch.setattr(L, "QUANT_SCALES", {})
    monkeypatch.setattr(L, "QUANT_OBSERVED_TAGS", {})
    monkeypatch.setattr(L, "QUANT_SCALE_MISSES", [])
    scales, dyn = _eager_scales(model, variables, images)
    assert scales

    monkeypatch.setattr(L, "QUANT_SCALES", scales)
    monkeypatch.setattr(L, "QUANT_SCALE_MISSES", [])
    sta = model.apply(variables, images, train=False)
    assert not L.QUANT_SCALE_MISSES, L.QUANT_SCALE_MISSES[:5]
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

    monkeypatch.setattr(L, "QUANT_INT8", True)
    monkeypatch.setattr(L, "QUANT_MIN_CH", 0)
    monkeypatch.setattr(L, "QUANT_SCALES", {})
    monkeypatch.setattr(L, "QUANT_OBSERVED_TAGS", {})
    monkeypatch.setattr(L, "QUANT_SCALE_MISSES", [])
    scales, out = _eager_scales(model, variables, images)
    dyn = jax.device_get(dd3d_inference(cfg, out, intr))
    partial = dict(list(sorted(scales.items()))[::2])  # every other conv

    monkeypatch.setattr(L, "QUANT_SCALES", partial)
    monkeypatch.setattr(L, "QUANT_SCALE_MISSES", [])
    mix = jax.device_get(dd3d_inference(cfg, model.apply(variables, images, train=False), intr))
    for k in dyn:
        np.testing.assert_array_equal(dyn[k], mix[k], err_msg=k)


def test_unknown_tag_falls_back_to_dynamic(built, monkeypatch):
    """The shape-tag keying is CHECKED (VERDICT r4 #7): serving a canvas
    (or call pattern) whose tags were never calibrated must (a) record the
    misses, (b) fall back to the dynamic scale for exactly those calls —
    here calibrated-on-this-batch dynamic == static, so the output stays
    bit-exact while the program degrades to dynamic scales instead of
    applying wrong constants."""
    cfg, model, images, _, variables = built

    monkeypatch.setattr(L, "QUANT_INT8", True)
    monkeypatch.setattr(L, "QUANT_MIN_CH", 0)
    monkeypatch.setattr(L, "QUANT_SCALES", {})
    monkeypatch.setattr(L, "QUANT_OBSERVED_TAGS", {})
    monkeypatch.setattr(L, "QUANT_SCALE_MISSES", [])
    scales, dyn = _eager_scales(model, variables, images)
    multi = [k for k, v in scales.items() if len(v) > 1]
    assert multi, "need shared tower convs with distinct per-level shapes"

    # Re-tag every scale as if calibrated on a DIFFERENT canvas: every
    # lookup misses, output must equal full-dynamic.
    wrong = {k: {f"9{t}": a for t, a in v.items()} for k, v in scales.items()}
    monkeypatch.setattr(L, "QUANT_SCALES", wrong)
    monkeypatch.setattr(L, "QUANT_SCALE_MISSES", [])
    out = model.apply(variables, images, train=False)
    assert L.QUANT_SCALE_MISSES, "uncalibrated tags must be detected"
    assert {m[0] for m in L.QUANT_SCALE_MISSES} >= set(multi)
    for key in dyn:
        for lvl, (a, b) in enumerate(zip(dyn[key], out[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f"{key}[{lvl}]")

    # Control: the true tags pass clean (no miss, same bit-exact output).
    monkeypatch.setattr(L, "QUANT_SCALES", scales)
    monkeypatch.setattr(L, "QUANT_SCALE_MISSES", [])
    out2 = model.apply(variables, images, train=False)
    assert not L.QUANT_SCALE_MISSES
    for key in dyn:
        for lvl, (a, b) in enumerate(zip(dyn[key], out2[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=f"{key}[{lvl}]")


def test_multi_canvas_merge(built):
    """One capture_scales run over TWO canvas shapes yields a merged file
    whose tower entries carry BOTH canvases' level shapes — the TTA-bucket
    calibration pattern. Tags from the two canvases must not collide for
    the towers (distinct level shapes)."""
    cfg, model, images, _, variables = built
    rng = np.random.RandomState(1)
    images_b = jnp.asarray(rng.rand(2, 128, 256, 3).astype(np.float32) * 255)
    merged = _capture(cfg, model, variables, [images, images_b])
    single = _capture(cfg, model, variables, [images])
    n_levels = len(cfg.FE.OUT_FEATURES)
    tower = [k for k in merged if "tower" in k]
    assert tower
    for k in tower:
        assert len(single[k]) == n_levels
        assert len(merged[k]) == 2 * n_levels, (k, sorted(merged[k]))
        assert set(single[k]) <= set(merged[k])
        # same-canvas entries agree (running max over identical batches)
        for t, a in single[k].items():
            assert merged[k][t] == pytest.approx(a)


def test_legacy_percall_file_converts_or_rejects(tmp_path):
    """Round-4 files ({path: [amax per call]} + __tags__) convert on load;
    a legacy file WITHOUT tags is rejected (never silently mis-keyed)."""
    p = tmp_path / "legacy.json"
    p.write_text(json.dumps({
        "a/conv": [1.0, 2.0],
        "__tags__": {"a/conv": ["4x4x8", "2x2x8"]},
    }))
    scales = L.load_quant_scales(str(p))
    assert scales == {"a/conv": {"4x4x8": 1.0, "2x2x8": 2.0}}

    q = tmp_path / "untagged.json"
    q.write_text(json.dumps({"a/conv": [1.0, 2.0]}))
    with pytest.raises(ValueError, match="recalibrate"):
        L.load_quant_scales(str(q))


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
    doubled = {k: {t: x * 4.0 for t, x in v.items()} for k, v in scales.items()}
    p.write_text(json.dumps(doubled))
    import os

    os.utime(p, (os.path.getmtime(p) + 1, os.path.getmtime(p) + 1))
    fn_b = get_inference_fn(model, cfg_a.clone(), jit=True)
    assert fn_b is not fn_a
    b = np.asarray(fn_b(variables, images, intr)["scores"])
    assert not np.array_equal(a, b)  # 4x coarser scales actually engaged
