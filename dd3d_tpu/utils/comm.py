"""Distributed communication helpers — TPU-native mapping of the reference's
NCCL/MPI/Gloo stack (tridet/utils/comm.py, SURVEY.md §2.9).

| reference                          | here                                   |
|------------------------------------|----------------------------------------|
| mpirun + NCCL process group        | jax.distributed.initialize()           |
| MPI object bcast (:19-50)          | broadcast_from_master (multihost)      |
| gather_dict (:71-88)               | gather_dict (process_allgather)        |
| reduce_sum all-reduce (:91-100)    | in-graph global sums under sharding    |

In-graph collectives need no helpers: a jitted global-batch computation over
a sharded mesh IS the all-reduce. These utilities cover host-side (eval/data)
object collectives in multi-process (multi-host TPU) runs, and degrade to
no-ops in single-process runs.
"""
import logging
from typing import Any, Dict, Optional

import jax

LOG = logging.getLogger(__name__)


def init_distributed(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX. Single mechanism replacing mpirun + NCCL +
    MPI (tridet/utils/setup.py:23-60). No-op if already initialized or
    single-process."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    import os

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # Multi-process CPU (local multi-host testing) needs an explicit
        # cross-process collectives backend; TPU uses ICI and ignores this.
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception as e:  # older jax or no gloo build
            LOG.warning("could not enable gloo CPU collectives: %s", e)
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            LOG.warning("jax.distributed already initialized: %s", e)
        else:
            # Proceeding single-process after an explicit multi-process
            # request would silently train on a fraction of the data.
            raise


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_distributed() -> bool:
    """cf. tridet/utils/comm.py:15."""
    return jax.process_count() > 1


def is_main_process() -> bool:
    return jax.process_index() == 0


def master_only(fn):
    """Decorator: run only on process 0 (tridet/utils/comm.py:53-68)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if is_main_process():
            return fn(*args, **kwargs)
        return None

    return wrapper


def broadcast_from_master(obj: Any) -> Any:
    """Broadcast a picklable object from process 0 (tridet/utils/comm.py:19-50).

    Two-phase: broadcast the pickled payload size, then the padded payload
    (broadcast_one_to_all needs identical shapes on every process)."""
    if not is_distributed():
        return obj
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    data = pickle.dumps(obj) if is_main_process() else b""
    size = multihost_utils.broadcast_one_to_all(np.asarray([len(data)]))
    buf = np.zeros(int(size[0]), dtype=np.uint8)
    if is_main_process():
        buf[:] = np.frombuffer(data, dtype=np.uint8)
    buf = multihost_utils.broadcast_one_to_all(buf)
    return pickle.loads(buf.tobytes())


def all_gather_objects(obj: Any) -> list:
    """Gather picklable objects from all processes (the MPI allgather of
    tridet/data/build.py:214 and eval gathers, kitti_3d_evaluator.py:152-161)."""
    if not is_distributed():
        return [obj]
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.asarray([payload.size]))
    max_size = int(sizes.max())
    padded = np.zeros(max_size, dtype=np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, : int(sizes[i, 0])].tobytes()) for i in range(gathered.shape[0])]


def gather_dict(d: Dict) -> Dict:
    """Merge per-process dicts onto every process (tridet/utils/comm.py:71-88)."""
    merged = {}
    for part in all_gather_objects(d):
        merged.update(part)
    return merged
