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
    workers_list = ([int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3 else [1, 2, 4, 8])
    target = float(sys.argv[4]) if len(sys.argv) > 4 else 598.6  # bench.py imgs/s/chip
    cache_dir = sys.argv[5] if len(sys.argv) > 5 else ""  # DATALOADER.DECODED_CACHE_DIR
    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    cfg.DATALOADER.DECODED_CACHE_DIR = cache_dir
    cfg.DATASET_ROOT = root
    cfg.DATASETS.TRAIN.NAME = "kitti_3d_train"
    cfg.SOLVER.IMS_PER_BATCH = 16
    register_datasets(cfg)
    n_cores = _os.cpu_count() or 1

    for use_proc in ([False, True] if mode == "both" else [mode == "proc"]):
        for n_workers in workers_list:
            cfg.DATALOADER.TRAIN.USE_PROCESS_POOL = use_proc
            cfg.DATALOADER.TRAIN.NUM_WORKERS = n_workers
            loader = build_train_dataloader(cfg)
            it = iter(loader)
            b = next(it)  # warmup (spawn + first batch)
            n_batches = 12
            t0 = time.perf_counter()
            for _ in range(n_batches):
                b = next(it)
            dt = time.perf_counter() - t0
            imgs = n_batches * cfg.SOLVER.IMS_PER_BATCH
            ips = imgs / dt
            # per-core normalization: on an n-core box with w busy workers,
            # effective cores used = min(w, n); project the cores needed to
            # feed `target` imgs/s from per-core throughput.
            per_core = ips / min(n_workers, n_cores)
            print({"mode": "process" if use_proc else "thread",
                   "workers": n_workers,
                   "imgs_per_s_host": round(ips, 1),
                   "per_core": round(per_core, 1),
                   "cores_to_feed_target": round(target / per_core, 1),
                   "image_shape": tuple(np.asarray(b[0]["image"]).shape)}, flush=True)
            del it, loader


if __name__ == "__main__":
    main()

