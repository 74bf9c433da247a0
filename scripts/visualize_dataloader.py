#!/usr/bin/env python
"""Dataloader visualization CLI — rebuild of the reference
`scripts/visualize_dataloader.py`: renders GT 2D/3D boxes and BEV views
through the full mapper/augmentation stack. Writes PNGs to --output-dir
(headless; the reference used an interactive cv2 window)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment", default="dd3d_kitti_dla34")
    parser.add_argument("--dataset", default=None)
    parser.add_argument("--num-images", type=int, default=8)
    parser.add_argument("--output-dir", default="/tmp/dd3d_tpu_vis")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    from scripts.train import parse_overrides

    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.data import register_datasets
    from dd3d_tpu.data.build import build_train_dataloader
    from dd3d_tpu.visualizers import get_dataloader_visualizer
    from dd3d_tpu.visualizers.draw import save_vis
    from dd3d_tpu.data.catalog import MetadataCatalog

    cfg = get_experiment_cfg(args.experiment)
    cfg = parse_overrides(args.overrides, cfg)
    register_datasets(cfg)

    dataset_name = args.dataset or cfg.DATASETS.TRAIN.NAME
    md = MetadataCatalog.get(dataset_name)
    visualizers = [get_dataloader_visualizer(cfg, n, dataset_name) for n in md.get("loader_visualizers", ())]

    loader = build_train_dataloader(cfg, dataset_name=dataset_name, batch_size=1, num_workers=1)
    count = 0
    # iterate raw mapped samples (before collation) for visualization
    import numpy as np

    rng = np.random.RandomState(0)
    for d in loader.dataset_dicts[: args.num_images]:
        sample = loader.mapper(d, rng)
        for vis in visualizers:
            img = vis.visualize(sample)
            path = save_vis(img, args.output_dir, f"{count:04d}_{type(vis).__name__}")
            print("wrote", path)
        count += 1


if __name__ == "__main__":
    main()
