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
