"""3D box visualizers: projected wireframes + BEV view.

Rebuild of `tridet/visualizers/box3d_visualizer.py` roles (image wireframes
from projected corners, side-by-side BEV canvas).
"""
import numpy as np

from dd3d_tpu.data.catalog import MetadataCatalog
from dd3d_tpu.visualizers.draw import BEVImage, draw_boxes3d, mosaic


class Box3DDataloaderVisualizer:
    def __init__(self, cfg, dataset_name: str):
        self.class_names = MetadataCatalog.get(dataset_name).get("thing_classes", [])

    def visualize(self, sample: dict) -> np.ndarray:
        img = np.ascontiguousarray(sample["image"].astype(np.uint8))
        g = sample["gt_boxes3d"]
        k = sample["intrinsics"]
        quat, proj_ctr, depth, size = g[:, :4], g[:, 4:6], g[:, 6:7], g[:, 7:]
        inv_k = np.linalg.inv(k)
        rays = np.concatenate([proj_ctr, np.ones_like(depth)], axis=1) @ inv_k.T
        tvec = rays * depth
        wire = draw_boxes3d(img, quat, tvec, size, k, sample["gt_classes"])
        bev = BEVImage().render_boxes3d(quat, tvec, size, sample["gt_classes"]).data
        h = max(wire.shape[0], bev.shape[0])
        return mosaic([wire, bev], grid_cols=2)


class Box3DPredictionVisualizer:
    def __init__(self, cfg, dataset_name: str, inference_output_dir: str):
        self.class_names = MetadataCatalog.get(dataset_name).get("thing_classes", [])
        self.output_dir = inference_output_dir

    def visualize(self, image: np.ndarray, det: dict, intrinsics: np.ndarray, score_thresh: float = 0.3) -> np.ndarray:
        keep = det["scores_3d"] >= score_thresh
        img = np.ascontiguousarray(image.astype(np.uint8))
        wire = draw_boxes3d(img, det["quat"][keep], det["tvec"][keep], det["size"][keep], intrinsics, det["classes"][keep])
        bev = BEVImage().render_boxes3d(det["quat"][keep], det["tvec"][keep], det["size"][keep], det["classes"][keep]).data
        return mosaic([wire, bev], grid_cols=2)
