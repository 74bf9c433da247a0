"""Host input-pipeline throughput: thread pool vs process pool mapping."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(1, _os.path.dirname(_os.path.abspath(__file__)))
import sys, time
import numpy as np

from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.data import register_datasets
from dd3d_tpu.data.build import build_train_dataloader


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dd3d_overfit_fixture"
    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    cfg.DATASET_ROOT = root
    cfg.DATASETS.TRAIN.NAME = "kitti_3d_train"
    cfg.SOLVER.IMS_PER_BATCH = 16
    register_datasets(cfg)

    for use_proc in ([False, True] if mode == "both" else [mode == "proc"]):
        cfg.DATALOADER.TRAIN.USE_PROCESS_POOL = use_proc
        loader = build_train_dataloader(cfg)
        it = iter(loader)
        b = next(it)  # warmup (spawn + first batch)
        n_batches = 12
        t0 = time.perf_counter()
        for _ in range(n_batches):
            b = next(it)
        dt = time.perf_counter() - t0
        imgs = n_batches * cfg.SOLVER.IMS_PER_BATCH
        print({"mode": "process" if use_proc else "thread",
               "imgs_per_s_host": round(imgs / dt, 1),
               "ms_per_img": round(dt / imgs * 1e3, 2),
               "image_shape": tuple(np.asarray(b[0]["image"]).shape)}, flush=True)
        del it, loader


if __name__ == "__main__":
    main()

