"""Building-block layers: conv+norm+act, frozen BN, learnable Scale/Offset.

Rebuilds the roles of detectron2's `Conv2d/get_norm` and
`tridet/layers/normalization.py` (Scale, Offset, ModuleListDial) in flax.

TPU-first choices:
- NHWC layout everywhere (native for TPU convolutions).
- Compute dtype bf16 with fp32 params (`dtype` / `param_dtype`); normalization
  statistics and residual adds stay fp32 via flax's promotion rules.
- `ModuleListDial`'s hidden round-robin state (normalization.py:30-40) is
  replaced by EXPLICIT per-level norm indexing: the caller passes `level` and
  the module holds one norm per FPN level.
"""
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# kaiming_normal(fan_out) == caffe2 "MSRAFill", used for backbone + towers
# (tridet/modeling/feature_extractor/dla.py:296-297, fcos2d.py:118-122).
kaiming_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# kaiming_uniform(a=1): gain = 2 / (1 + a^2) = 1.0, fan_in, uniform — used for
# predictor convs (fcos2d.py:124-130, fcos3d.py:152-160).
kaiming_uniform_a1 = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


class FrozenBatchNorm(nn.Module):
    """BatchNorm with permanently frozen statistics and affine parameters.

    Equivalent to detectron2's FrozenBatchNorm2d: scale/bias/mean/var all live
    in the (non-trainable) `batch_stats` collection, so the optimizer never
    touches them; values come from init (identity) or a converted checkpoint.

    `folded()` exposes the affine as per-channel (mul, add) in fp32 so a
    preceding conv can absorb it into its kernel/bias (see FoldableConv) —
    valid in BOTH train and eval because the statistics never update and the
    affine params carry no gradient.
    """

    features: int
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    def setup(self):
        self._scale = self.variable("batch_stats", "scale", nn.initializers.ones, None, (self.features,), jnp.float32)
        self._bias = self.variable("batch_stats", "bias", nn.initializers.zeros, None, (self.features,), jnp.float32)
        self._mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (self.features,), jnp.float32)
        self._var = self.variable("batch_stats", "var", nn.initializers.ones, None, (self.features,), jnp.float32)

    def folded(self):
        """(mul, add) fp32 so that norm(x) == x * mul + add."""
        mul = self._scale.value / jnp.sqrt(self._var.value + self.epsilon)
        add = self._bias.value - self._mean.value * mul
        return mul, add

    def __call__(self, x):
        # Apply the folded affine in the ACTIVATION dtype — d2's
        # FrozenBatchNorm2d casts scale/bias down with `.to(x.dtype)`.
        mul, add = self.folded()
        return (x * mul.astype(x.dtype) + add.astype(x.dtype)).astype(self.dtype)


class FoldableBatchNorm(nn.Module):
    """Live BatchNorm, equivalent to flax `nn.BatchNorm(momentum=0.9,
    epsilon=1e-5)` (same param/stat tree: params scale/bias, batch_stats
    mean/var; A/B-tested in tests/test_norm_folding.py), plus `folded()`
    exposing the INFERENCE affine (running stats) so a preceding conv can
    absorb it at eval. Train mode is untouched: batch statistics, running
    stat updates, and the normalize pass behave exactly like nn.BatchNorm.
    """

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        self.ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (self.features,), jnp.float32)
        self.ra_var = self.variable("batch_stats", "var", nn.initializers.ones, None, (self.features,), jnp.float32)

    def folded(self):
        """(mul, add) fp32 from RUNNING stats: only valid at inference."""
        mul = self.scale * jax.lax.rsqrt(self.ra_var.value + self.epsilon)
        add = self.bias - self.ra_mean.value * mul
        return mul, add

    def batch_affine(self, x):
        """(mul, add) fp32 from x's BATCH statistics, updating the running
        averages — the train-mode normalization as an explicit affine, for
        callers that apply it elsewhere (e.g. as a per-pixel map over a
        packed canvas whose slice x is; see level_pack.py)."""
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.mean(xf * xf, axis=(0, 1, 2)) - mean * mean  # fast variance, like flax
        if not self.is_initializing() and self.is_mutable_collection("batch_stats"):
            self.ra_mean.value = self.momentum * self.ra_mean.value + (1.0 - self.momentum) * mean
            self.ra_var.value = self.momentum * self.ra_var.value + (1.0 - self.momentum) * var
        mul = self.scale * jax.lax.rsqrt(var + self.epsilon)
        add = self.bias - mean * mul
        return mul, add

    def __call__(self, x, use_running_average: bool = True):
        if use_running_average:
            mean, var = self.ra_mean.value, self.ra_var.value
            mul = self.scale * jax.lax.rsqrt(var + self.epsilon)
            add = self.bias - mean * mul
        else:
            mul, add = self.batch_affine(x)
        return (x * mul.astype(x.dtype) + add.astype(x.dtype)).astype(self.dtype)


def make_norm(norm: str, features: int, dtype=jnp.float32, name: Optional[str] = None):
    """Norm factory mirroring detectron2 `get_norm` for the subset the
    reference uses: BN / FrozenBN / '' (none)."""
    if norm == "BN":
        return FoldableBatchNorm(features=features, momentum=0.9, epsilon=1e-5, dtype=dtype, name=name)
    if norm == "FrozenBN":
        return FrozenBatchNorm(features=features, dtype=dtype, name=name)
    if norm in ("", None):
        return None
    raise NotImplementedError(f"Norm {norm!r}")


# When True (default), a FrozenBN following a conv is absorbed into the conv
# kernel/bias (exact: y = conv(x, W)*mul + add == conv(x, W*mul) + add).
# XLA:TPU does NOT fuse broadcast-multiply affines into conv epilogues, so
# the unfolded form costs a separate full-resolution pass per norm (xplane
# trace, ROADMAP round-3). Module-global so tests can A/B both paths.
FOLD_FROZEN_BN = True

# Opt-in int8 post-training-quantized inference (v5e int8 MXU peak is 2x
# bf16). When True, every NORM-FOLDED conv (i.e. the eval-graph backbone /
# FPN-with-norm / head-tower convs — exactly the convs that receive a folded
# affine; predictors and norm-free convs stay bf16) with at least
# QUANT_MIN_CH input channels runs as a dynamic-PTQ int8 conv:
# per-output-channel symmetric weight scales, per-tensor dynamic activation
# scale, int8xint8->int32 accumulation, fp32 dequant. No calibration pass is
# needed and checkpoints are unchanged.
#
# These globals are the TRACE-TIME mechanism; the config keys
# TPU.QUANT_INT8 / TPU.QUANT_MIN_CH are the user interface. Every jitted
# closure builder (postprocess.get_inference_fn, the TTA wrapper, bench.py)
# calls set_quant_from_cfg(cfg) INSIDE its traced function so retraces can
# never pick up another config's setting, and the inference-fn cache keys on
# the full TPU subtree (postprocess._infer_fingerprint). The train step
# forces QUANT_INT8 off at trace time: round() has zero gradient, so a
# quantized FrozenBN backbone would silently stop training.
# Accuracy drift is pinned by tests/test_int8_infer.py.
QUANT_INT8 = False

# Minimum input-channel count for a conv to quantize. The early small-channel
# high-resolution stages (DLA C=16/32) are HBM/tiling-bound, where dynamic
# quantization's extra activation passes (max-reduce + quantize) cost more
# than the halved MXU time saves; the wide mid/late convs are MXU-bound and
# win. Swept on the v5e (scripts/bench_int8_ab.py), see ROADMAP round-4.
QUANT_MIN_CH = 256

# Static (calibrated) activation scales:
# {"/".join(module_path): {"HxWxC" shape tag: act_amax}}. When a quantizing
# conv's (path, tag) is present, its activation scale becomes a trace-time
# CONSTANT (amax/127) and the dynamic per-batch abs-max reduce + its extra
# activation pass disappear from the program — the remaining dynamic-quant
# overhead named in BASELINE.md. Scales are keyed by the activation SHAPE
# (batch excluded — scale is per-tensor): the shared head-tower convs run
# once per FPN level with very different activation ranges, and each level
# has a distinct shape, so the tag identifies the call site without any
# call-ordering assumption (the r4 call-index scheme's one fragility,
# VERDICT r4 #7) AND lets one merged file serve several canvases (TTA
# buckets). A (path, tag) miss falls back to the DYNAMIC scale and is
# recorded in QUANT_SCALE_MISSES — degraded throughput, never silently
# wrong constants. Produced by dd3d_tpu/models/calibrate.py: every folded
# conv sows its per-call abs-max into the `intermediates` collection (a
# no-op unless that collection is mutable), so calibration is just
# inference with mutable=["intermediates"] + a running max over batches.
QUANT_SCALES = {}

# Also quantize UNFOLDED convs (mul is None — the norm-free head predictor
# convs). Opt-in via TPU.QUANT_UNFOLDED: the predictors produce the decode
# inputs directly, so their quantization noise reaches scores/boxes with no
# norm in between; drift is bounded by tests and the overfit AP gate, but
# the shipped serving config keeps them bf16 (measurement in ROADMAP r5).
QUANT_UNFOLDED = False

# Trace-time capture: {path: [tag per call]} in sow order (matches the order
# `sow` appends abs-maxes), read back by calibrate.capture_scales to pair
# each observed amax with its shape tag.
QUANT_OBSERVED_TAGS = {}
# (path, tag) per static-lookup miss while a scales file was set, for
# tests/monitoring.
QUANT_SCALE_MISSES = []

_SCALES_FILE_CACHE = {}


def load_quant_scales(path):
    """Load a calibration JSON {conv_path: {shape_tag: amax}}; cached by
    (path, mtime). Legacy round-4 files ({conv_path: [amax per call]} +
    "__tags__") convert on load; a legacy file WITHOUT tags cannot be keyed
    safely and is rejected (recalibrate — scripts/calibrate_int8.py)."""
    import json
    import os

    key = (path, os.path.getmtime(path))
    if key not in _SCALES_FILE_CACHE:
        with open(path) as f:
            raw = json.load(f)
        tags = raw.pop("__tags__", None)
        scales = {}
        for k, v in raw.items():
            if isinstance(v, dict):  # current schema
                scales[str(k)] = {str(t): float(a) for t, a in v.items()}
            else:  # legacy per-call list; zip with its recorded tags
                if tags is None or k not in tags:
                    raise ValueError(
                        f"{path}: legacy per-call scales for {k!r} without shape tags "
                        "cannot be used safely; recalibrate with scripts/calibrate_int8.py"
                    )
                vals = v if isinstance(v, (list, tuple)) else [v]
                ent = {}
                for t, a in zip(tags[k], vals):
                    ent[str(t)] = max(float(a), ent.get(str(t), 0.0))
                scales[str(k)] = ent
        _SCALES_FILE_CACHE[key] = scales
    return _SCALES_FILE_CACHE[key]


def set_quant_from_cfg(cfg):
    """Set the trace-time PTQ globals from TPU.QUANT_INT8 / TPU.QUANT_MIN_CH /
    TPU.QUANT_SCALES_PATH. Call inside the function being jitted (runs at
    trace time only)."""
    global QUANT_INT8, QUANT_MIN_CH, QUANT_SCALES, QUANT_UNFOLDED
    global QUANT_OBSERVED_TAGS, QUANT_SCALE_MISSES
    tpu = cfg.get("TPU", {})
    QUANT_INT8 = bool(tpu.get("QUANT_INT8", False))
    QUANT_MIN_CH = int(tpu.get("QUANT_MIN_CH", 256))
    QUANT_UNFOLDED = bool(tpu.get("QUANT_UNFOLDED", False))
    scales_path = tpu.get("QUANT_SCALES_PATH", "") or ""
    QUANT_SCALES = load_quant_scales(scales_path) if scales_path else {}
    QUANT_OBSERVED_TAGS = {}
    QUANT_SCALE_MISSES = []


def _int8_conv(x, kernel, *, strides, padding, rhs_dilation, groups, out_dtype, act_amax=None):
    """PTQ int8 conv: returns dequantized activations in out_dtype.

    kernel is the fp32 (possibly norm-folded) HWIO weight. Scales:
    weights per output channel (exact symmetric max/127); activations one
    per-tensor scale — a calibrated CONSTANT when act_amax is given (static
    PTQ: no reduce pass), else computed dynamically per batch (a VPU reduce
    over x — cheap next to the conv, but a full extra activation read).
    """
    xf = x.astype(jnp.float32)
    if act_amax is not None:
        # Same f32 arithmetic as the dynamic branch so a static scale equal
        # to the observed abs-max reproduces the dynamic result bit-exactly
        # (pinned by tests/test_int8_static.py).
        xs = jnp.maximum(jnp.float32(act_amax), 1e-12) / 127.0
    else:
        xs = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    ws = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12) / 127.0  # (O,)
    wq = jnp.clip(jnp.round(kernel / ws), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=strides,
        padding=padding,
        rhs_dilation=rhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    return (y.astype(jnp.float32) * (xs * ws)).astype(out_dtype)


class FoldableConv(nn.Module):
    """NHWC conv (flax nn.Conv semantics for the subset ConvNorm uses) whose
    kernel/bias can absorb a following norm's per-channel affine:

        norm(conv(x) + b) = conv_{W*mul}(x) + (b*mul + add)

    The kernel scaling is a (O,)-broadcast multiply on the WEIGHT (tiny, and
    done in fp32 before the bf16 cast), and conv+bias is a natively fused
    TPU op — this removes the separate affine pass over the activation.
    Parameter path/shape ("kernel" HWIO, optional "bias") matches nn.Conv so
    checkpoints and the torch converter are unaffected.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = False
    dtype: Any = jnp.bfloat16
    kernel_init: Callable = kaiming_normal_fan_out

    @nn.compact
    def __call__(self, x, mul=None, add=None):
        k = self.kernel_size
        cin = x.shape[-1] // self.groups
        kernel = self.param("kernel", self.kernel_init, (k, k, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32) if self.use_bias else None
        if mul is not None:
            kernel = kernel * mul  # fp32, broadcast over the O axis
            bias = (bias * mul + add) if bias is not None else add
        p = self.dilation * (k - 1) // 2
        act_amax = None
        quant_eligible = mul is not None or QUANT_UNFOLDED
        if QUANT_INT8 and quant_eligible:
            # Calibration capture: observed per-call activation abs-max, a
            # no-op (dead code XLA removes) unless the caller applies with
            # mutable=["intermediates"] (scripts/calibrate_int8.py). Sown
            # (appended, one entry per call — shared tower convs run once
            # per FPN level) for EVERY folded conv so one calibration run
            # serves any QUANT_MIN_CH gate choice.
            self.sow("intermediates", "act_amax", jnp.max(jnp.abs(x.astype(jnp.float32))))
            # Static scale lookup by (path, activation shape tag) — see
            # QUANT_SCALES. A miss (un-calibrated canvas or call pattern)
            # falls back to the dynamic scale and warns: degraded
            # throughput, never a silently-wrong constant.
            path = "/".join(self.scope.path)
            tag = f"{x.shape[1]}x{x.shape[2]}x{x.shape[3]}"
            QUANT_OBSERVED_TAGS.setdefault(path, []).append(tag)
            if QUANT_SCALES:
                act_amax = QUANT_SCALES.get(path, {}).get(tag)
                if act_amax is None:
                    QUANT_SCALE_MISSES.append((path, tag))
                    import logging

                    logging.getLogger(__name__).warning(
                        "static int8 scales: no calibrated scale for %s at shape %s — "
                        "falling back to a dynamic scale (recalibrate for this canvas)",
                        path, tag,
                    )
        if QUANT_INT8 and quant_eligible and x.shape[-1] >= QUANT_MIN_CH:
            # Folded convs exist only in eval graphs (and FrozenBN trains);
            # quantizing exactly this set covers the backbone + towers and
            # leaves predictors / norm-free convs in bf16 — unless
            # TPU.QUANT_UNFOLDED opts the predictors in too.
            y = _int8_conv(
                x,
                kernel,
                strides=(self.strides, self.strides),
                padding=[(p, p), (p, p)],
                rhs_dilation=(self.dilation, self.dilation),
                groups=self.groups,
                out_dtype=self.dtype,
                act_amax=act_amax,
            )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(self.strides, self.strides),
                padding=[(p, p), (p, p)],
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class ConvNorm(nn.Module):
    """Conv -> norm -> activation, like detectron2's Conv2d wrapper.

    bias is enabled iff there is no norm, matching the reference convention
    (e.g. tridet/modeling/feature_extractor/dla.py:28-47). FrozenBN norms
    are folded into the conv (see FoldableConv) — numerically the same op,
    one less full-resolution pass.
    """

    features: int
    kernel_size: int = 3
    strides: int = 1
    dilation: int = 1
    groups: int = 1
    norm: str = "BN"
    activation: Optional[Callable] = None
    use_bias: Optional[bool] = None  # default: no norm -> bias
    dtype: Any = jnp.bfloat16
    kernel_init: Callable = kaiming_normal_fan_out

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_bias = self.use_bias if self.use_bias is not None else self.norm in ("", None)
        conv = FoldableConv(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            dilation=self.dilation,
            groups=self.groups,
            use_bias=use_bias,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="conv",
        )
        norm = make_norm(self.norm, self.features, dtype=self.dtype, name="norm")
        foldable = FOLD_FROZEN_BN and (
            isinstance(norm, FrozenBatchNorm)
            or (isinstance(norm, FoldableBatchNorm) and not train)  # running stats at eval
        )
        if foldable:
            x = conv(x, *norm.folded())
        else:
            x = conv(x)
            if norm is not None:
                if isinstance(norm, (nn.BatchNorm, FoldableBatchNorm)):
                    x = norm(x, use_running_average=not train)
                else:
                    x = norm(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class PredictorConv(nn.Module):
    """Drop-in for the heads' 3x3 nn.Conv predictors — identical param
    names/shapes/dtypes/init (kernel HWIO fp32 + optional bias), so
    checkpoints and the torch converter are unaffected — whose kernel/bias
    are attributes, enabling `fused_predictor_apply` to run sibling
    predictors as ONE conv.

    cf. the reference's per-predictor Conv2d calls
    (tridet/modeling/dd3d/fcos2d.py:96-110, fcos3d.py:100-144); on TPU each
    separate predictor re-reads the full tower activation from HBM (profiled
    r5: 16.4 ms/step of 158 at batch 128), so sibling predictors fuse.
    """

    features: int
    in_features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    kernel_init: Callable = kaiming_uniform_a1

    def setup(self):
        k = self.kernel_size
        self.kernel = self.param(
            "kernel", self.kernel_init, (k, k, self.in_features, self.features), jnp.float32
        )
        self.bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )

    def __call__(self, x):
        return fused_predictor_apply(x, [self], self.dtype)[0]


def fused_predictor_apply(x, preds, dtype):
    """Run sibling PredictorConvs — all reading the SAME feature map, same
    kernel size/stride — as ONE conv with output-channel-concatenated
    kernels, then split the result. Exact: each output channel's contraction
    is computed identically to its standalone conv; a bias-free predictor
    gets a zero bias slice (+0). One full activation read instead of
    len(preds) — the dominant predictor cost at batch-serving sizes."""
    k = preds[0].kernel_size
    assert all(m.kernel_size == k for m in preds)
    p = k // 2
    kern = preds[0].kernel if len(preds) == 1 else jnp.concatenate([m.kernel for m in preds], axis=-1)
    if any(m.bias is not None for m in preds):
        bias = jnp.concatenate(
            [m.bias if m.bias is not None else jnp.zeros((m.features,), jnp.float32) for m in preds]
        )
    else:
        bias = None
    if QUANT_INT8 and QUANT_UNFOLDED:
        # TPU.QUANT_UNFOLDED opt-in: quantize the predictor convs too (same
        # scheme as FoldableConv — per-out-channel weight scales, per-tensor
        # activation scale, static when calibrated). Keyed by the FIRST
        # sibling's module path, since the group runs as one conv.
        m0 = preds[0]
        m0.sow("intermediates", "act_amax", jnp.max(jnp.abs(x.astype(jnp.float32))))
        path = "/".join(m0.scope.path)
        tag = f"{x.shape[1]}x{x.shape[2]}x{x.shape[3]}"
        QUANT_OBSERVED_TAGS.setdefault(path, []).append(tag)
        act_amax = None
        if QUANT_SCALES:
            act_amax = QUANT_SCALES.get(path, {}).get(tag)
            if act_amax is None:
                QUANT_SCALE_MISSES.append((path, tag))
                import logging

                logging.getLogger(__name__).warning(
                    "static int8 scales: no calibrated scale for %s at shape %s — "
                    "falling back to a dynamic scale (recalibrate for this canvas)",
                    path, tag,
                )
        y = _int8_conv(
            x, kern, strides=(1, 1), padding=[(p, p), (p, p)],
            rhs_dilation=(1, 1), groups=1, out_dtype=dtype, act_amax=act_amax,
        )
    else:
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kern.astype(dtype),
            window_strides=(1, 1),
            padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    outs = []
    o = 0
    for m in preds:
        outs.append(y[..., o : o + m.features])
        o += m.features
    return outs


class Scale(nn.Module):
    """Learnable scalar multiplier (tridet/layers/normalization.py:12-18)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.constant(self.init_value), (1,), jnp.float32)
        return x * scale.astype(x.dtype)


class Offset(nn.Module):
    """Learnable scalar offset (tridet/layers/normalization.py:21-27)."""

    init_value: float = 0.0

    @nn.compact
    def __call__(self, x):
        bias = self.param("bias", nn.initializers.constant(self.init_value), (1,), jnp.float32)
        return x + bias.astype(x.dtype)


class PerLevelNorms(nn.Module):
    """One norm layer per FPN level, applied by explicit level index.

    Replaces `ModuleListDial` (tridet/layers/normalization.py:30-40), whose
    round-robin mutable state is hostile to functional tracing; here the call
    site passes the level index, which is static at trace time.
    """

    num_levels: int
    features: int
    norm: str = "BN"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, level: int, train: bool = False, fold_query: bool = False,
                 affine_query: bool = False):
        norm = make_norm(self.norm, self.features, dtype=self.dtype, name=f"norm{level}")
        if affine_query:
            # This level's norm as an explicit (mul, add) — for the packed-
            # levels head path, which applies it as a per-pixel map instead
            # of folding into the (shared) conv kernel. At eval the affine
            # comes from frozen/running stats; in train mode a live BN
            # computes BATCH stats from x (the level's slice of the packed
            # canvas — identical values to the standalone level tensor) and
            # updates its running averages. NOTE: FOLD_FROZEN_BN does not
            # apply here — the packed path never folds into the kernel; the
            # map IS the unfolded application.
            if norm is None:
                return None
            if train and isinstance(norm, FoldableBatchNorm):
                if x is None:
                    raise ValueError("train-mode affine_query needs the level slice for batch stats")
                return norm.batch_affine(x)
            return norm.folded()
        if fold_query:
            # Return this level's affine as (mul, add) for conv folding when
            # the norm is foldable (FrozenBN — train-independent; live BN —
            # running stats, eval only), else None and the caller applies
            # the norm conventionally.
            if FOLD_FROZEN_BN and (
                isinstance(norm, FrozenBatchNorm)
                or (isinstance(norm, FoldableBatchNorm) and not train)
            ):
                return norm.folded()
            return None
        if norm is None:
            return x
        if isinstance(norm, (nn.BatchNorm, FoldableBatchNorm)):
            return norm(x, use_running_average=not train)
        return norm(x)
