"""COCO 2D evaluator: hand-computed golden values for the pycocotools
protocol (101-pt AP, area-range ignore semantics, AR@maxDets).

pycocotools itself is not installed in this image, so the goldens are small
cases where the COCO summary values are derivable by hand (exact PR curves).
"""
import numpy as np
import pytest

from dd3d_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from dd3d_tpu.evaluators.coco2d import COCO2DEvaluator


def _register(name, dicts, classes=("thing",)):
    DatasetCatalog.register(name, lambda: dicts)
    md = MetadataCatalog.get(name)
    md["thing_classes"] = list(classes)


def _det(image_id, boxes, scores, classes=None):
    boxes = np.asarray(boxes, np.float64).reshape(-1, 4)
    return {
        "image_id": image_id,
        "boxes2d": boxes,
        "scores": np.asarray(scores, np.float64),
        "classes": np.asarray(classes if classes is not None else [0] * len(boxes), np.int64),
    }


def test_perfect_single_detection():
    dicts = [{"image_id": "a", "annotations": [{"category_id": 0, "bbox": [0, 0, 10, 10]}]}]
    _register("coco_fix_perfect", dicts)
    ev = COCO2DEvaluator("coco_fix_perfect")
    ev.process([_det("a", [[0, 0, 10, 10]], [0.9])])
    r = ev.evaluate()["bbox"]
    assert r["AP"] == pytest.approx(100.0)
    assert r["AP50"] == pytest.approx(100.0)
    assert r["AP75"] == pytest.approx(100.0)
    # area 100 px^2 -> small; no medium/large GT anywhere -> NaN
    assert r["APs"] == pytest.approx(100.0)
    assert np.isnan(r["APm"]) and np.isnan(r["APl"])
    assert r["AR@1"] == pytest.approx(100.0)
    assert r["AR@100"] == pytest.approx(100.0)
    assert r["AP-thing"] == pytest.approx(100.0)


def test_ranking_with_false_positive():
    # 2 GTs; dets ordered TP(0.9), FP(0.8), TP(0.7):
    # PR points: (r=.5, p=1), (r=.5, p=.5), (r=1, p=2/3)
    # envelope: [1, 2/3, 2/3]; 101-pt AP = (51*1 + 50*(2/3))/101
    dicts = [{
        "image_id": "a",
        "annotations": [
            {"category_id": 0, "bbox": [0, 0, 10, 10]},
            {"category_id": 0, "bbox": [20, 20, 30, 30]},
        ],
    }]
    _register("coco_fix_rank", dicts)
    ev = COCO2DEvaluator("coco_fix_rank")
    ev.process([
        _det("a", [[0, 0, 10, 10], [40, 40, 50, 50], [20, 20, 30, 30]], [0.9, 0.8, 0.7]),
    ])
    r = ev.evaluate()["bbox"]
    expected = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101 * 100
    assert r["AP"] == pytest.approx(expected, abs=1e-6)
    assert r["AR@100"] == pytest.approx(100.0)


def test_area_range_ignore_semantics():
    # One small GT (10x10=100 px^2) and one large GT (200x200=40000 px^2),
    # both detected perfectly. In the "small" evaluation the large GT is
    # IGNORED: the detection matching it must be neither TP nor FP, so
    # APs = 100 (not diluted by a "false positive" large det). Same for APl.
    dicts = [{
        "image_id": "a",
        "annotations": [
            {"category_id": 0, "bbox": [0, 0, 10, 10]},
            {"category_id": 0, "bbox": [300, 300, 500, 500]},
        ],
    }]
    _register("coco_fix_area", dicts)
    ev = COCO2DEvaluator("coco_fix_area")
    ev.process([
        _det("a", [[0, 0, 10, 10], [300, 300, 500, 500]], [0.9, 0.8]),
    ])
    r = ev.evaluate()["bbox"]
    assert r["AP"] == pytest.approx(100.0)
    assert r["APs"] == pytest.approx(100.0)
    assert r["APl"] == pytest.approx(100.0)
    assert np.isnan(r["APm"])
    assert r["ARs"] == pytest.approx(100.0)
    assert r["ARl"] == pytest.approx(100.0)


def test_ar_maxdets():
    # 2 perfect dets on 2 GTs; AR@1 only keeps the top-scored det -> 50.
    dicts = [{
        "image_id": "a",
        "annotations": [
            {"category_id": 0, "bbox": [0, 0, 50, 50]},
            {"category_id": 0, "bbox": [60, 60, 110, 110]},
        ],
    }]
    _register("coco_fix_maxdet", dicts)
    ev = COCO2DEvaluator("coco_fix_maxdet")
    ev.process([
        _det("a", [[0, 0, 50, 50], [60, 60, 110, 110]], [0.9, 0.8]),
    ])
    r = ev.evaluate()["bbox"]
    assert r["AR@1"] == pytest.approx(50.0)
    assert r["AR@10"] == pytest.approx(100.0)
    assert r["AR@100"] == pytest.approx(100.0)


def test_iou_sweep_partial_overlap():
    # det overlaps GT with IoU ~ 0.6807: TP for thresholds .5..~.65,
    # FP above -> AP = (4/10)*100 exactly with thresholds {.5,.55,.6,.65}.
    gt = [0, 0, 10, 10]
    det = [1.5, 0, 11.5, 10]  # inter = 8.5*10=85, union=115 -> IoU ~0.739
    # IoU = 85/115 = 0.7391: TP at .50,.55,.60,.65,.70 -> 5/10
    dicts = [{"image_id": "a", "annotations": [{"category_id": 0, "bbox": gt}]}]
    _register("coco_fix_iou", dicts)
    ev = COCO2DEvaluator("coco_fix_iou")
    ev.process([_det("a", [det], [0.9])])
    r = ev.evaluate()["bbox"]
    assert r["AP"] == pytest.approx(50.0, abs=1e-6)
    assert r["AP50"] == pytest.approx(100.0)
    assert r["AP75"] == pytest.approx(0.0)


def test_output_keys_match_d2_table():
    dicts = [{"image_id": "a", "annotations": [{"category_id": 0, "bbox": [0, 0, 10, 10]}]}]
    _register("coco_fix_keys", dicts, classes=("Car",))
    ev = COCO2DEvaluator("coco_fix_keys")
    ev.process([_det("a", [[0, 0, 10, 10]], [0.9])])
    r = ev.evaluate()["bbox"]
    for k in ("AP", "AP50", "AP75", "APs", "APm", "APl",
              "AR@1", "AR@10", "AR@100", "ARs", "ARm", "ARl", "AP-Car"):
        assert k in r, k
