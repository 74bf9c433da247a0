"""Profiling / tracing harness (SURVEY.md §5.1 rebuild target).

The reference has nothing beyond iteration timing; here we provide:
- `trace(logdir)`: context manager around `jax.profiler` producing a
  Perfetto/XProf trace of device execution,
- `timed(fn)`: wall-clock timing with a HOST-FETCH barrier (on the axon
  tunnel platform `block_until_ready` returns before execution completes, so
  fetching one output leaf is the only reliable barrier),
- `annotate(name)`: TraceAnnotation for labeling regions inside traces.
"""
import contextlib
import time
from typing import Callable, Tuple

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def _barrier(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf).ravel()[:1].sum()


def timed(fn: Callable, *args, iters: int = 20, warmup: int = 2) -> Tuple[float, object]:
    """Returns (seconds_per_call, last_output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _barrier(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _barrier(out)
    return (time.perf_counter() - t0) / iters, out
