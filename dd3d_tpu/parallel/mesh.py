"""Device mesh + sharding utilities — the TPU-native replacement for the
reference's NCCL/MPI/DDP stack (SURVEY.md §2.9, §5.8).

The reference's entire distribution model is data parallelism:
- `DistributedDataParallel` gradient all-reduce (scripts/train.py:67-72)
- SyncBatchNorm cross-replica stats (scripts/train.py:63-66)
- `reduce_sum` loss normalizers (tridet/utils/comm.py:91-100)
- MPI object collectives for dataset/eval gathers (utils/comm.py:19-88)

On TPU all of these collapse into ONE mechanism: jit a global-batch train
step over a `Mesh` with the batch sharded along the `data` axis. XLA inserts
the all-reduces (gradients, BN statistics, loss-normalizer sums) over ICI
automatically; `jax.distributed.initialize` + `multihost_utils` cover the
multi-host object gathers.

A second mesh axis `model` is plumbed through for intra-layer sharding of the
conv channel dimension on very large backbones; the reference has no TP/PP/SP
(SURVEY.md §2.9) so the default mesh is 1-D.
"""
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D (or trailing-singleton N-D) mesh over the first `n_devices`."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devs = np.asarray(devices[:n_devices])
    shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    return Mesh(devs.reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array in the batch dict with its batch dim sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
