"""Native nuScenes metric engine vs hand-computed devkit semantics.

The oracle values follow nuscenes-devkit `eval/detection/algo.py`
(accumulate / calc_ap / calc_tp) exactly; each test states the arithmetic.
"""
import math

import numpy as np
import pytest

from dd3d_tpu.evaluators.nuscenes_metrics import (
    MetricData,
    accumulate,
    angle_diff,
    calc_ap,
    calc_tp,
    compute_detection_metrics,
    filter_boxes,
    gt_from_dataset_dicts,
    preds_from_submission,
    quaternion_yaw,
    scale_iou,
)

CLASSES = ("car", "pedestrian")


def box(name, x=0.0, y=0.0, size=(2.0, 4.0, 1.5), yaw=0.0, vel=(0.0, 0.0),
        attr="vehicle.parked", score=None, ego=(0.0, 0.0)):
    b = {
        "translation": [x, y, 1.0],
        "size": list(size),
        "yaw": yaw,
        "velocity": list(vel),
        "detection_name": name,
        "attribute_name": attr,
        "ego_translation": list(ego),
    }
    if score is not None:
        b["detection_score"] = score
    return b


def test_scale_iou_and_angle_diff():
    # same size -> IoU 1; half-volume inside -> 0.5
    assert scale_iou(box("car"), box("car")) == pytest.approx(1.0)
    a = box("car", size=(2, 4, 1))
    b = box("car", size=(2, 4, 2))
    assert scale_iou(a, b) == pytest.approx(0.5)
    # angle wrap: 350 deg vs 10 deg differ by 20 deg
    assert abs(angle_diff(math.radians(350), math.radians(10), 2 * np.pi)) == pytest.approx(
        math.radians(20))
    # period pi (barriers): opposite headings are identical
    assert abs(angle_diff(0.0, np.pi, np.pi)) == pytest.approx(0.0, abs=1e-9)


def test_quaternion_yaw():
    # 90 deg about z: (w, x, y, z) = (cos45, 0, 0, sin45)
    s = math.sqrt(0.5)
    assert quaternion_yaw([s, 0, 0, s]) == pytest.approx(np.pi / 2)
    assert quaternion_yaw([1, 0, 0, 0]) == pytest.approx(0.0)


def test_perfect_predictions_give_nds_1():
    gt = {"s0": [box("car", 0, 0), box("pedestrian", 5, 5, attr="pedestrian.standing")],
          "s1": [box("car", 10, 0)]}
    preds = {
        "s0": [box("car", 0, 0, score=0.9),
               box("pedestrian", 5, 5, attr="pedestrian.standing", score=0.8)],
        "s1": [box("car", 10, 0, score=0.95)],
    }
    m = compute_detection_metrics(gt, preds, CLASSES)
    assert m["mAP"] == pytest.approx(1.0)
    assert m["NDS"] == pytest.approx(1.0)
    assert m["mATE"] == pytest.approx(0.0)
    assert m["mASE"] == pytest.approx(0.0)
    assert m["mAOE"] == pytest.approx(0.0)


def test_ap_interpolation_matches_devkit_arithmetic():
    """One class, 2 GT, 2 preds: one TP (conf .9), one far FP (conf .8).

    rec = [0.5, 0.5], prec = [1.0, 0.5]. np.interp (exactly what the devkit
    uses) gives 1.0 for recall < 0.5, 0.5 AT the duplicated point 0.5, and 0
    beyond (right=0). calc_ap drops the first 11 points, subtracts 0.1,
    clips, and normalizes by 0.9:
      points 11..49 -> 0.9 each (39 pts), point 50 -> 0.4, 51..100 -> 0
      AP = (39 * 0.9 + 0.4) / 90 / 0.9 = 35.5 / 81
    """
    gt = {"s0": [box("car", 0, 0), box("car", 20, 0)]}
    preds = {"s0": [box("car", 0, 0, score=0.9), box("car", 40, 0, score=0.8)]}
    md = accumulate(gt, preds, "car", 2.0)
    assert calc_ap(md) == pytest.approx(35.5 / 81.0)


def test_tp_errors_average_over_recall_range():
    """Single GT matched with a 1 m translation offset at dist_th 2 m:
    trans_err cummean is 1.0 everywhere, max recall = 1.0, so
    calc_tp = mean over grid[11..100] of 1.0 = 1.0 -> mATE 1.0."""
    gt = {"s0": [box("car", 0, 0)]}
    preds = {"s0": [box("car", 1.0, 0, score=0.9)]}
    md = accumulate(gt, preds, "car", 2.0)
    assert calc_tp(md, "trans_err") == pytest.approx(1.0)
    # and the same match at threshold 0.5 is a miss -> no matches
    md05 = accumulate(gt, preds, "car", 0.5)
    assert calc_ap(md05) == pytest.approx(0.0)


def test_greedy_matching_takes_each_gt_once():
    # two preds on one GT: higher conf becomes TP, the other FP
    gt = {"s0": [box("car", 0, 0)]}
    preds = {"s0": [box("car", 0.1, 0, score=0.9), box("car", 0.0, 0, score=0.8)]}
    md = accumulate(gt, preds, "car", 2.0)
    # rec=[1,1], prec=[1,.5]; np.interp gives 1.0 below recall 1.0 and 0.5
    # AT the duplicated endpoint -> AP = (89*0.9 + 0.4)/90/0.9 = 80.5/81
    assert calc_ap(md) == pytest.approx(80.5 / 81.0)


def test_range_filter_drops_far_boxes():
    boxes = {"s0": [box("car", 60, 0), box("car", 10, 0), box("barrier", 40, 0)]}
    out = filter_boxes(boxes)
    names = [b["translation"][0] for b in out["s0"]]
    # car at 60 m > 50 m range; barrier at 40 m > 30 m range
    assert names == [10]


def test_orientation_period_for_barrier():
    gt = {"s0": [box("barrier", 0, 0, yaw=0.0, attr="")]}
    preds = {"s0": [box("barrier", 0, 0, yaw=np.pi, attr="", score=0.9)]}
    md = accumulate(gt, preds, "barrier", 2.0)
    assert calc_tp(md, "orient_err") == pytest.approx(0.0, abs=1e-9)
    # a car with yaw pi off keeps the full pi error
    gt = {"s0": [box("car", 0, 0, yaw=0.0)]}
    preds = {"s0": [box("car", 0, 0, yaw=np.pi, score=0.9)]}
    md = accumulate(gt, preds, "car", 2.0)
    assert calc_tp(md, "orient_err") == pytest.approx(np.pi)


def test_class_exclusions_and_nds_weighting():
    """traffic_cone contributes no AOE/AVE/AAE; NDS = (5 mAP + sum scores)/10."""
    gt = {"s0": [box("traffic_cone", 0, 0, attr="")]}
    preds = {"s0": [box("traffic_cone", 0, 0, attr="", score=0.9)]}
    m = compute_detection_metrics(gt, preds, ("traffic_cone",))
    assert m["mAP"] == pytest.approx(1.0)
    assert np.isnan(m["mAOE_traffic_cone"])
    # perfect: ATE=ASE=0 -> scores 1; excluded metrics are NaN -> score 0
    assert m["NDS"] == pytest.approx((5 * 1.0 + 1.0 + 1.0 + 0 + 0 + 0) / 10.0)


def test_attribute_error():
    gt = {"s0": [box("car", 0, 0, attr="vehicle.moving")]}
    preds = {"s0": [box("car", 0, 0, attr="vehicle.parked", score=0.9)]}
    md = accumulate(gt, preds, "car", 2.0)
    assert calc_tp(md, "attr_err") == pytest.approx(1.0)
    preds = {"s0": [box("car", 0, 0, attr="vehicle.moving", score=0.9)]}
    md = accumulate(gt, preds, "car", 2.0)
    assert calc_tp(md, "attr_err") == pytest.approx(0.0)


def test_velocity_error():
    gt = {"s0": [box("car", 0, 0, vel=(3.0, 4.0))]}
    preds = {"s0": [box("car", 0, 0, vel=(0.0, 0.0), score=0.9)]}
    md = accumulate(gt, preds, "car", 2.0)
    assert calc_tp(md, "vel_err") == pytest.approx(5.0)


def test_no_predictions_and_no_gt():
    md = accumulate({"s0": [box("car")]}, {"s0": []}, "car", 2.0)
    assert calc_ap(md) == pytest.approx(0.0)
    assert calc_tp(md, "trans_err") == pytest.approx(1.0)  # devkit default
    md = accumulate({"s0": []}, {"s0": [box("car", score=0.5)]}, "car", 2.0)
    assert calc_ap(md) == pytest.approx(0.0)


def test_gt_from_dataset_dicts_roundtrip():
    """Camera-frame annotation -> global GT must invert the dataset
    construction (data/datasets/nuscenes.py:112-117)."""
    from dd3d_tpu.structures.pose import Pose

    # camera at (10, 5, 0), yawed 90 deg about z (world)
    s = math.sqrt(0.5)
    pose_world_cam = Pose(wxyz=np.array([s, 0, 0, s]), tvec=np.array([10.0, 5.0, 0.0]))
    # a box 20 m in front of the camera along camera z... use camera-frame
    # identity rotation, tvec (0, 0, 20)
    box_cam = Pose(wxyz=np.array([1.0, 0, 0, 0]), tvec=np.array([0.0, 0.0, 20.0]))
    box_world = pose_world_cam * box_cam
    d = {
        "sample_token": "sA",
        "pose": {"wxyz": pose_world_cam.quat.tolist(), "tvec": pose_world_cam.tvec.tolist()},
        "extrinsics": {"wxyz": [1.0, 0, 0, 0], "tvec": [0.0, 0.0, 0.0]},
        "annotations": [
            {"category_id": 0, "instance_id": "i0", "speed": 2.0,
             "bbox3d": np.concatenate([box_cam.quat, box_cam.tvec, [2.0, 4.0, 1.5]]).tolist(),
             "attribute_id": 1},
        ],
    }
    # duplicate camera view of the same instance must dedup
    gt = gt_from_dataset_dicts([d, d], ("car",), {"car": ["vehicle.moving", "vehicle.parked"]})
    assert len(gt["sA"]) == 1
    g = gt["sA"][0]
    np.testing.assert_allclose(g["translation"], box_world.tvec, atol=1e-9)
    expected_yaw = math.atan2(box_world.rotation_matrix[1, 0], box_world.rotation_matrix[0, 0])
    assert g["yaw"] == pytest.approx(expected_yaw)
    assert g["attribute_name"] == "vehicle.parked"
    assert np.linalg.norm(g["velocity"]) == pytest.approx(2.0)
    assert g["detection_name"] == "car"


def test_preds_from_submission_yaw():
    s = math.sqrt(0.5)
    results = {"sA": [{
        "translation": [1.0, 2.0, 0.5], "size": [2, 4, 1.5],
        "rotation": [s, 0, 0, s], "velocity": [1.0, 0.0],
        "detection_name": "car", "detection_score": 0.7,
        "attribute_name": "vehicle.moving",
    }]}
    preds = preds_from_submission(results, {"sA": (0.0, 0.0)})
    assert preds["sA"][0]["yaw"] == pytest.approx(np.pi / 2)
    assert preds["sA"][0]["detection_score"] == 0.7


def test_max_recall_ind():
    md = MetricData.no_predictions()
    assert md.max_recall_ind == 0


def test_evaluator_native_nds_full_circle():
    """Register a fixture dataset, feed the evaluator predictions equal to
    the GT (camera frame), and require native NDS == 1: the evaluator's
    camera->global transform and the GT assembly must agree exactly."""
    from dd3d_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from dd3d_tpu.evaluators.nuscenes import NuscenesEvaluator
    from dd3d_tpu.structures.pose import Pose

    s = math.sqrt(0.5)
    pose_world_cam = Pose(wxyz=np.array([s, 0, 0, s]), tvec=np.array([100.0, -40.0, 1.6]))
    quat_cam = np.array([s, s, 0.0, 0.0])  # x(+90 deg): camera-frame upright box
    tvec_cam = np.array([2.0, 0.5, 18.0])
    wlh = [1.9, 4.6, 1.7]
    name = "nusc_metric_fixture"
    dicts = [{
        "sample_token": "sZ",
        "sample_id": "sZ",
        "pose": {"wxyz": pose_world_cam.quat.tolist(), "tvec": pose_world_cam.tvec.tolist()},
        "extrinsics": {"wxyz": [1.0, 0, 0, 0], "tvec": [0.0, 0.0, 0.0]},
        "annotations": [{
            "category_id": 3, "instance_id": "iZ", "speed": 4.0, "attribute_id": 0,
            "bbox3d": np.concatenate([quat_cam, tvec_cam, wlh]).tolist(),
        }],
    }]
    if name not in DatasetCatalog.list():
        DatasetCatalog.register(name, lambda: dicts)
    md = MetadataCatalog.get(name)
    md["thing_classes"] = [
        "barrier", "bicycle", "bus", "car", "construction_vehicle", "motorcycle",
        "pedestrian", "traffic_cone", "trailer", "truck"]

    det = {
        "image_id": "imgZ", "sample_id": "sZ",
        "classes": np.array([3]), "scores": np.array([0.9]), "scores_3d": np.array([0.9]),
        "boxes2d": np.zeros((1, 4)),
        "quat": quat_cam[None], "tvec": tvec_cam[None], "size": np.asarray(wlh)[None],
        "attributes": np.array([0]), "speeds": np.array([4.0]),
    }
    ev = NuscenesEvaluator(name, output_dir="/tmp/nusc_native_eval_test")
    ev.process([det], poses=[pose_world_cam])
    res = ev.evaluate()["nuscenes"]
    # The prediction reproduces the GT exactly, so every per-car metric is
    # perfect...
    for th in (0.5, 1.0, 2.0, 4.0):
        assert res[f"AP_car_{th}"] == pytest.approx(1.0), res
    assert res["mATE_car"] == pytest.approx(0.0, abs=1e-9)
    assert res["mASE_car"] == pytest.approx(0.0, abs=1e-9)
    assert res["mAOE_car"] == pytest.approx(0.0, abs=1e-9)
    assert res["mAVE_car"] == pytest.approx(0.0, abs=1e-9)
    assert res["mAAE_car"] == pytest.approx(0.0, abs=1e-9)
    # ...while devkit aggregation still averages over all 10 configured
    # classes (absent classes: AP 0, TP error 1):
    #   mAP = 1/10; ATE/ASE scores = 1 - 9/10; AOE = 1 - 8/9 (cone excluded);
    #   AVE/AAE = 1 - 7/8 (cone+barrier excluded)
    assert res["mAP"] == pytest.approx(0.1)
    expected_nds = (5 * 0.1 + 0.1 + 0.1 + (1 - 8 / 9) + 0.125 + 0.125) / 10
    assert res["NDS"] == pytest.approx(expected_nds), res["NDS"]
