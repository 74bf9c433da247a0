"""Dataloader visualization during training (reference scripts/train.py:168-183):
the train loop renders GT 2D boxes + 3D wireframes from the live batch every
VIS.DATALOADER_PERIOD steps, writes PNGs, and mirrors them to W&B when
enabled (EventStorage.put_image is a no-op without wandb)."""
import glob
import os

import numpy as np
import pytest

from dd3d_tpu.utils.events import EventStorage
from tests.test_train_step import _tiny_batch
from tests.test_checkpoint_resume import _tiny_cfg


def test_put_image_without_wandb_is_noop(tmp_path):
    with EventStorage(str(tmp_path)) as st:
        st.put_image("vis/x", np.zeros((8, 8, 3), np.uint8))  # must not raise


@pytest.mark.slow
def test_train_loop_writes_dataloader_vis(tmp_path):
    from dd3d_tpu.models import build_model
    from dd3d_tpu.training.train_loop import train

    cfg = _tiny_cfg()
    cfg.SOLVER.CHECKPOINT_PERIOD = 1000
    cfg.VIS.DATALOADER_PERIOD = 1
    cfg.VIS.DATALOADER_MAX_NUM_SAMPLES = 2
    model = build_model(cfg)

    def batches():
        for _ in range(2):
            yield {k: np.asarray(v) for k, v in _tiny_batch(8).items()}

    out = str(tmp_path / "run")
    train(cfg, batches(), model=model, max_iter=2, output_dir=out, log_period=1)

    pngs = glob.glob(os.path.join(out, "visualization", "dataloader_step*"))
    assert len(pngs) >= 2, pngs
