"""Static int8 PTQ calibration (library side).

Dynamic PTQ (TPU.QUANT_INT8) computes one activation abs-max per quantized
conv per batch — an extra full activation pass each. `capture_scales`
records those observed abs-maxes over a calibration set; inference run with
TPU.QUANT_SCALES_PATH=<json of them> bakes each scale in as a trace-time
constant and the dynamic reduce passes disappear from the program (the
residual dynamic-quant overhead named in BASELINE.md).

Capture mechanism: every norm-folded conv sows its input abs-max into the
`intermediates` collection (models/layers.py FoldableConv — a no-op in
normal inference), so calibration is plain batched inference applied with
mutable=["intermediates"] plus a running max across batches. Scales are
recorded for EVERY folded conv, so one calibration serves any
TPU.QUANT_MIN_CH gate.

The CLI wrapper is scripts/calibrate_int8.py. cf. the inference path this
accelerates, tridet/modeling/dd3d/fcos2d.py:242-367; the reference has no
quantized path.
"""
import json
import os


def capture_scales(cfg, model, variables, image_batches):
    """Run calibration batches; returns {conv_path: {shape_tag: act_amax}}
    (python floats; tag = "HxWxC" of the conv's input activation, see
    models/layers.py QUANT_SCALES).

    `image_batches` yields (B, H, W, 3) arrays. Batches may use SEVERAL
    canvas shapes (e.g. the TTA buckets): per-batch observed abs-maxes are
    paired with that batch's trace-time shape tags and merged by running
    max, so one merged file serves every calibrated canvas. The QUANT
    globals are pinned from cfg with QUANT_INT8 forced ON so the observed
    activations follow the deployment (quantized-upstream) regime.
    """
    import jax

    import dd3d_tpu.models.layers as _L
    from flax import traverse_util

    calib_cfg = cfg.clone()
    calib_cfg.TPU.QUANT_INT8 = True
    calib_cfg.TPU.QUANT_SCALES_PATH = ""  # dynamic scales during calibration

    @jax.jit
    def capture(variables, images):
        _L.set_quant_from_cfg(calib_cfg)  # trace-time, see layers.py
        _, inter = model.apply(variables, images, train=False, mutable=["intermediates"])
        return inter["intermediates"]

    running = {}
    tag_cache = {}
    n = 0
    for images in image_batches:
        canvas = tuple(images.shape[1:])
        inter = jax.device_get(capture(variables, images))
        # QUANT_OBSERVED_TAGS holds the LATEST trace's per-call shape tags
        # in sow order (set_quant_from_cfg resets it at each retrace, i.e.
        # once per canvas shape); the first batch of each canvas immediately
        # follows its trace, so snapshot then and reuse for repeats —
        # `sow` appended one abs-max per call in the same order, so zip
        # pairs each value with its tag.
        if canvas not in tag_cache:
            tag_cache[canvas] = {k: list(v) for k, v in _L.QUANT_OBSERVED_TAGS.items()}
        tags = tag_cache[canvas]
        for k, v in traverse_util.flatten_dict(inter).items():
            if k[-1] != "act_amax":
                continue
            path = "/".join(k[:-1])
            ent = running.setdefault(path, {})
            for tag, amax in zip(tags.get(path, []), [float(x) for x in v]):
                ent[tag] = max(amax, ent.get(tag, 0.0))
        n += 1
    if not running:
        raise ValueError("no calibration batches")
    n_sites = sum(len(v) for v in running.values())
    print(f"calibrated {len(running)} convs / {n_sites} (path, shape) sites over {n} batches")
    return running


def prepare_static_scales(cfg, model, variables, image_batches, tag="scales"):
    """Calibrate on `image_batches` and return a CLONE of cfg with the static
    scales baked in (TPU.QUANT_INT8=True, TPU.QUANT_SCALES_PATH=<temp json>).

    The single entry point for in-process static-int8 setup — bench.py,
    scripts/prof_trace.py and __graft_entry__.dryrun_multichip all use it so
    the shipped bench configuration and the certified ones cannot drift
    (ADVICE r4). Calibration always captures with QUANT_MIN_CH=0 so the
    written scales serve any gate choice; the returned cfg keeps the
    caller's QUANT_MIN_CH. The temp file is removed at interpreter exit.
    """
    import atexit
    import tempfile

    calib_cfg = cfg.clone()
    calib_cfg.TPU.QUANT_MIN_CH = 0
    scales = capture_scales(calib_cfg, model, variables, image_batches)
    fd, path = tempfile.mkstemp(prefix=f"int8_{tag}_", suffix=".json")
    with os.fdopen(fd, "w") as f:
        json.dump(scales, f)
    atexit.register(lambda p=path: os.path.exists(p) and os.remove(p))
    out_cfg = cfg.clone()
    out_cfg.TPU.QUANT_INT8 = True
    out_cfg.TPU.QUANT_SCALES_PATH = path
    return out_cfg
