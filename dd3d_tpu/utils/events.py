"""Metrics/event storage: scalar logging with optional W&B mirroring.

Rebuild of the reference's observability stack (SURVEY.md §5.5):
- d2 EventStorage + `WandbEventStorage` (tridet/utils/events.py:11-21),
- flattened eval-dict logging `k1/k2/k3` (tridet/utils/wandb.py:85-106),
- console metric printing every N steps (scripts/train.py:159-162).

Scalars go to an in-memory history + a JSONL file; if wandb is importable
and WANDB.ENABLED, every put_scalar is mirrored (events.py:18-21).
"""
import json
import logging
import os
import time
from collections import defaultdict
from typing import Dict, Optional

LOG = logging.getLogger(__name__)

_CURRENT_STORAGE = None


def get_event_storage():
    if _CURRENT_STORAGE is None:
        raise RuntimeError("No EventStorage active; create one via EventStorage(...)")
    return _CURRENT_STORAGE


class EventStorage:
    def __init__(self, output_dir: Optional[str] = None, wandb_enabled: bool = False, wandb_kwargs: Optional[dict] = None):
        self._history = defaultdict(list)
        self._step = 0
        self._file = None
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self._file = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if wandb_enabled:
            try:
                import wandb  # type: ignore

                self._wandb = wandb
                if wandb.run is None:
                    wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                LOG.warning("WANDB.ENABLED but wandb is not installed; disabling.")

    def __enter__(self):
        global _CURRENT_STORAGE
        self._prev = _CURRENT_STORAGE
        _CURRENT_STORAGE = self
        return self

    def __exit__(self, *a):
        global _CURRENT_STORAGE
        _CURRENT_STORAGE = self._prev
        if self._file:
            self._file.close()

    @property
    def iter(self):
        return self._step

    def step(self):
        self._step += 1

    def put_scalar(self, name: str, value: float):
        value = float(value)
        self._history[name].append((self._step, value))
        if self._wandb is not None:
            self._wandb.log({name: value}, step=self._step)

    def put_image(self, name: str, image, caption: Optional[str] = None):
        """Mirror a visualization image (HWC uint8) to W&B when enabled —
        the reference logs prediction/dataloader mosaics this way
        (scripts/train.py:177-183,251-260). No-op without wandb (the PNG on
        disk from visualizers.save_vis remains the durable artifact)."""
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(image, caption=caption)}, step=self._step)

    def put_scalars(self, **kwargs):
        for k, v in kwargs.items():
            self.put_scalar(k, v)
        if self._file:
            self._file.write(json.dumps({"step": self._step, "ts": time.time(), **{k: float(v) for k, v in kwargs.items()}}) + "\n")
            self._file.flush()

    def latest(self) -> Dict[str, float]:
        return {k: v[-1][1] for k, v in self._history.items()}

    def history(self, name: str):
        return list(self._history[name])


def flatten_dict(d: dict, prefix: str = "", sep: str = "/") -> Dict[str, float]:
    """`{a: {b: 1}}` -> `{a/b: 1}` (tridet/utils/wandb.py flatten semantics)."""
    out = {}
    for k, v in d.items():
        key = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_dict(v, key, sep))
        else:
            out[key] = v
    return out
