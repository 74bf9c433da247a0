"""Low-level drawing helpers (cv2): 2D boxes, projected 3D boxes, BEV canvas.

Rebuild of `tridet/utils/visualization.py` (mosaic/save_vis/colors) and
`tridet/visualizers/bev.py` (BEVImage).
"""
import os
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from dd3d_tpu.ops.geometry import project_points3d  # noqa: F401 (re-export convenience)

# bright palette like seaborn "bright" (kitti_3d build.py:31-42)
DEFAULT_COLORS = [
    (0, 154, 23), (255, 127, 14), (31, 119, 180), (227, 119, 194),
    (140, 86, 75), (148, 103, 189), (214, 39, 40), (127, 127, 127),
]

# edges of the 8-corner box in our corner order (see structures/boxes3d.py)
BOX_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),  # +x face
    (4, 5), (5, 6), (6, 7), (7, 4),  # -x face
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def draw_boxes2d(image: np.ndarray, boxes: np.ndarray, classes=None, scores=None,
                 class_names=None, colors=DEFAULT_COLORS, thickness=2) -> np.ndarray:
    out = image.copy()
    for i, b in enumerate(np.asarray(boxes).astype(int)):
        color = colors[int(classes[i]) % len(colors)] if classes is not None else colors[0]
        cv2.rectangle(out, (b[0], b[1]), (b[2], b[3]), color, thickness)
        label = ""
        if class_names is not None and classes is not None:
            label = class_names[int(classes[i])]
        if scores is not None:
            label += f" {float(scores[i]):.2f}"
        if label:
            cv2.putText(out, label, (b[0], max(b[1] - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return out


def draw_boxes3d(image: np.ndarray, quats: np.ndarray, tvecs: np.ndarray, sizes: np.ndarray,
                 intrinsics: np.ndarray, classes=None, colors=DEFAULT_COLORS, thickness=2) -> np.ndarray:
    """Project 8 corners and draw wireframes."""
    from dd3d_tpu.models.cross_camera import _corners_np

    out = image.copy()
    if len(quats) == 0:
        return out
    corners = _corners_np(np.asarray(quats, np.float64), np.asarray(tvecs, np.float64), np.asarray(sizes, np.float64))
    k = np.asarray(intrinsics, np.float64)
    for i in range(len(corners)):
        if corners[i][:, 2].min() <= 0.1:
            continue
        uvw = corners[i] @ k.T
        uv = (uvw[:, :2] / uvw[:, 2:3]).astype(int)
        color = colors[int(classes[i]) % len(colors)] if classes is not None else colors[0]
        for a, b in BOX_EDGES:
            cv2.line(out, tuple(uv[a]), tuple(uv[b]), color, thickness)
    return out


class BEVImage:
    """Bird-eye-view canvas; draws 3D boxes as rotated rectangles.
    cf. tridet/visualizers/bev.py:16."""

    def __init__(self, metric_width: float = 100.0, metric_height: float = 100.0, pixels_per_meter: int = 10):
        self.ppm = pixels_per_meter
        self.w = int(metric_width * pixels_per_meter)
        self.h = int(metric_height * pixels_per_meter)
        self.data = np.full((self.h, self.w, 3), 30, np.uint8)
        # ego at bottom-center; forward (camera z) goes up.
        cv2.circle(self.data, (self.w // 2, self.h - 1), 4, (0, 0, 255), -1)

    def render_boxes3d(self, quats, tvecs, sizes, classes=None, colors=DEFAULT_COLORS, thickness=2):
        from dd3d_tpu.models.cross_camera import boxes_to_bev5_np

        if len(quats) == 0:
            return self
        bev5 = boxes_to_bev5_np(np.asarray(quats, np.float64), np.asarray(tvecs, np.float64), np.asarray(sizes, np.float64))
        for i, (cx, cy, bw, bl, ang) in enumerate(bev5):
            # BEV frame: x right, y down-image (forward = -y). Map meters->px.
            px = int(self.w / 2 + cx * self.ppm)
            py = int(self.h + cy * self.ppm)
            color = colors[int(classes[i]) % len(colors)] if classes is not None else colors[0]
            rect = cv2.boxPoints(((px, py), (bw * self.ppm, bl * self.ppm), -ang))
            cv2.polylines(self.data, [rect.astype(np.int32)], True, color, thickness)
        return self


def mosaic(images: List[np.ndarray], grid_cols: Optional[int] = None, pad: int = 2) -> np.ndarray:
    """Tile images into a grid (tridet/utils/visualization.py:111)."""
    if not images:
        return np.zeros((1, 1, 3), np.uint8)
    n = len(images)
    cols = grid_cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    h = max(im.shape[0] for im in images) + pad
    w = max(im.shape[1] for im in images) + pad
    canvas = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        canvas[r * h : r * h + im.shape[0], c * w : c * w + im.shape[1]] = im
    return canvas


def save_vis(image: np.ndarray, output_dir: str, name: str):
    """cf. tridet/utils/visualization.py:25."""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, name if name.endswith(".png") else name + ".png")
    cv2.imwrite(path, image)
    return path
