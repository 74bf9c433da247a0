"""Checkpoint save/restore on orbax.

Replaces fvcore's `Checkpointer`/`PeriodicCheckpointer`
(scripts/train.py:50-52,86-89,185-186): saves model params + BN stats +
optimizer state + step, keeps the last N checkpoints, resumes from the
latest. (S3 off-box sync, utils/s3.py, is out of scope for the box — the
output dir is the durable artifact.)
"""
import os
from typing import Any, Optional

import orbax.checkpoint as ocp
from etils import epath


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self._dir = epath.Path(os.path.abspath(directory))
        self._mngr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any) -> None:
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        self._mngr.save(step, args=ocp.args.StandardSave(payload))
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, state: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            return state
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
        }
        restored = self._mngr.restore(step, args=ocp.args.StandardRestore(template))
        import jax.numpy as jnp

        return state.replace(
            step=jnp.asarray(step, jnp.int32),
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
