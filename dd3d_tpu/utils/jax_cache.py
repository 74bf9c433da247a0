"""Persistent XLA compilation cache, on by default for every entry point.

The reference has nothing to cache (eager torch); on TPU every process that
jits the train step or the inference graph pays a multi-minute XLA compile —
per BUCKETED IMAGE SHAPE — before the first step runs. With the persistent
cache the compile happens once per (program, shape, jaxlib) and later
processes deserialize it in seconds, which matters for exactly the workflows
the reference exercises per-process: short EVAL_ONLY runs
(tridet/scripts/train.py:54-59), periodic in-training evaluation, CLI
prediction, and multi-host launches where N processes would otherwise each
redo the identical compile.

Call `enable_persistent_cache()` before the first jit dispatch. It is a
no-op when the user already configured a cache dir (env
JAX_COMPILATION_CACHE_DIR or jax.config) or disabled it by setting
DD3D_TPU_NO_COMPILE_CACHE=1.
"""
import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/dd3d_tpu_xla_cache")


def enable_persistent_cache(cache_dir: str = None) -> bool:
    """Idempotent; returns True when the cache is (now) enabled."""
    if os.environ.get("DD3D_TPU_NO_COMPILE_CACHE", "") == "1":
        return False
    import jax

    current = jax.config.jax_compilation_cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if current:
        return True  # user/test config wins (tests/conftest.py sets its own)
    path = cache_dir or _DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Skip caching trivially fast compiles; keep everything that hurts.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is an optimization only
        return False
    return True
