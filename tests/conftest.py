"""Test harness: force CPU backend with 8 virtual devices BEFORE jax import.

This is the TPU answer to "test multi-device without a cluster"
(SURVEY.md §4): all sharding/mesh tests run against a fake 8-device mesh.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The environment may pre-set JAX_PLATFORMS=axon (real TPU); override at the
# config level too, since the plugin prepends itself to the platform list.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the train-step compile on CPU takes minutes;
# cache it across test runs.
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True)
def _reset_quant_globals():
    """The int8-PTQ trace-time globals (models/layers.py) are set from the
    cfg INSIDE jitted closures (set_quant_from_cfg) and deliberately persist
    for the process — so a test that traces with TPU.QUANT_INT8=True would
    otherwise leak quantized convs into every later folded-conv test
    (test_int8_static polluted test_level_pack's FrozenBN cases). Restore
    the defaults around every test."""
    import dd3d_tpu.models.layers as L

    global _QUANT_DEFAULTS
    if _QUANT_DEFAULTS is None:  # captured once, before any test can pollute
        _QUANT_DEFAULTS = (L.QUANT_INT8, L.QUANT_MIN_CH, L.QUANT_SCALES,
                           L.QUANT_OBSERVED_TAGS, L.QUANT_SCALE_MISSES)
    yield
    (L.QUANT_INT8, L.QUANT_MIN_CH, L.QUANT_SCALES,
     L.QUANT_OBSERVED_TAGS, L.QUANT_SCALE_MISSES) = _QUANT_DEFAULTS


_QUANT_DEFAULTS = None
