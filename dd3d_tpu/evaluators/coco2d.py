"""COCO-style 2D detection AP evaluator (numpy, dependency-free).

Replaces the reference's detectron2 `COCOEvaluator` + pycocotools C backend
(tridet/evaluators/__init__.py:23-27): pycocotools is not in this image, so
this is a faithful numpy implementation of the bbox AP protocol —
101-point interpolated AP averaged over IoU in {0.50:0.95:0.05}, greedy
per-image matching in score order against the best available GT, area-range
"all", maxDets=100. Reports AP, AP50, AP75 and per-class AP like the d2
evaluator's summary table.
"""
import logging
from collections import defaultdict
from typing import Dict, List

import numpy as np

from dd3d_tpu.data.catalog import DatasetCatalog, MetadataCatalog

LOG = logging.getLogger(__name__)

IOU_THRESHOLDS = np.arange(0.5, 0.951, 0.05)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)
MAX_DETS = 100


def _iou_matrix(dets: np.ndarray, gts: np.ndarray) -> np.ndarray:
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)))
    x1 = np.maximum(dets[:, None, 0], gts[None, :, 0])
    y1 = np.maximum(dets[:, None, 1], gts[None, :, 1])
    x2 = np.minimum(dets[:, None, 2], gts[None, :, 2])
    y2 = np.minimum(dets[:, None, 3], gts[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_d = (dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1])
    area_g = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    union = area_d[:, None] + area_g[None] - inter
    return inter / np.maximum(union, 1e-9)


def _ap_per_class(dt_by_img, gt_by_img, iou_thresh):
    """Greedy matching in global score order; 101-pt interpolated AP."""
    scores, matches = [], []
    total_gt = 0
    for img_id in gt_by_img.keys() | dt_by_img.keys():
        gts = gt_by_img.get(img_id, np.zeros((0, 4)))
        dts = dt_by_img.get(img_id, (np.zeros((0, 4)), np.zeros((0,))))
        boxes, scr = dts
        order = np.argsort(-scr)[:MAX_DETS]
        boxes, scr = boxes[order], scr[order]
        total_gt += len(gts)
        iou = _iou_matrix(boxes, gts)
        taken = np.zeros(len(gts), dtype=bool)
        for d in range(len(boxes)):
            best, best_iou = -1, iou_thresh
            for g in range(len(gts)):
                if taken[g]:
                    continue
                if iou[d, g] >= best_iou:
                    best, best_iou = g, iou[d, g]
            if best >= 0:
                taken[best] = True
                matches.append(1)
            else:
                matches.append(0)
            scores.append(scr[d])
    if total_gt == 0:
        return np.nan
    if not scores:
        return 0.0
    scores = np.asarray(scores)
    matches = np.asarray(matches)
    order = np.argsort(-scores)
    tp = np.cumsum(matches[order])
    fp = np.cumsum(1 - matches[order])
    recall = tp / total_gt
    precision = tp / np.maximum(tp + fp, 1e-9)
    # Monotone non-increasing precision envelope.
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    # 101-pt interpolation.
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    prec_at = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
    return float(prec_at.mean())


class COCO2DEvaluator:
    def __init__(self, dataset_name: str, output_dir=None):
        self._gt = defaultdict(dict)  # class -> img -> boxes
        md = MetadataCatalog.get(dataset_name)
        self._class_names = md["thing_classes"]
        for d in DatasetCatalog.get(dataset_name):
            for a in d.get("annotations", []):
                c = a["category_id"]
                self._gt[c].setdefault(d["image_id"], []).append(a["bbox"])
        self._gt = {
            c: {img: np.asarray(v, dtype=np.float64) for img, v in imgs.items()} for c, imgs in self._gt.items()
        }
        self.reset()

    def reset(self):
        self._dt = defaultdict(lambda: defaultdict(lambda: ([], [])))

    def process(self, per_image_detections: List[dict]):
        for det in per_image_detections:
            for i in range(len(det["classes"])):
                c = int(det["classes"][i])
                boxes, scores = self._dt[c][det["image_id"]]
                boxes.append(det["boxes2d"][i])
                scores.append(float(det["scores"][i]))

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        results = {}
        per_class_ap = {}
        ap_all, ap50, ap75 = [], [], []
        for c, name in enumerate(self._class_names):
            gt_imgs = self._gt.get(c, {})
            dt_imgs = {
                img: (np.asarray(b, dtype=np.float64).reshape(-1, 4), np.asarray(s, dtype=np.float64))
                for img, (b, s) in self._dt.get(c, {}).items()
            }
            aps = [_ap_per_class(dt_imgs, gt_imgs, t) for t in IOU_THRESHOLDS]
            aps = np.asarray(aps)
            if np.isnan(aps).all():
                continue
            per_class_ap[name] = float(np.nanmean(aps) * 100)
            ap_all.append(np.nanmean(aps))
            ap50.append(aps[0])
            ap75.append(aps[5])
        results["AP"] = float(np.mean(ap_all) * 100) if ap_all else float("nan")
        results["AP50"] = float(np.mean(ap50) * 100) if ap50 else float("nan")
        results["AP75"] = float(np.mean(ap75) * 100) if ap75 else float("nan")
        for name, v in per_class_ap.items():
            results[f"AP-{name}"] = v
        return {"bbox": results}
