import numpy as np
import pytest

from dd3d_tpu.evaluators.native import d3_box_overlap, rotated_iou_matrix
from dd3d_tpu.evaluators.kitti_3d import (
    KITTIEvaluationEngine,
    clean_kitti_data,
    convert_3d_box_to_kitti,
    get_thresholds,
)
from dd3d_tpu.data.datasets.kitti_3d import parse_label_file


def test_rotated_iou_axis_aligned():
    # angle=0 boxes reduce to axis-aligned IoU.
    a = np.array([[0.0, 0.0, 4.0, 2.0, 0.0]])
    b = np.array([[1.0, 0.0, 4.0, 2.0, 0.0]])  # shifted by 1 along x
    iou = rotated_iou_matrix(a, b)[0, 0]
    # inter = 3 x 2 = 6; union = 8 + 8 - 6 = 10
    assert iou == pytest.approx(0.6, abs=1e-9)

    # identical boxes
    assert rotated_iou_matrix(a, a)[0, 0] == pytest.approx(1.0, abs=1e-9)

    # disjoint
    c = np.array([[10.0, 10.0, 1.0, 1.0, 0.3]])
    assert rotated_iou_matrix(a, c)[0, 0] == 0.0


def test_rotated_iou_rotation_invariance():
    rng = np.random.RandomState(0)
    for _ in range(20):
        b1 = np.array([rng.randn() * 2, rng.randn() * 2, rng.rand() * 3 + 0.5, rng.rand() * 3 + 0.5, rng.rand() * np.pi])
        b2 = np.array([rng.randn() * 2, rng.randn() * 2, rng.rand() * 3 + 0.5, rng.rand() * 3 + 0.5, rng.rand() * np.pi])
        iou = rotated_iou_matrix(b1[None], b2[None])[0, 0]
        # rotate both boxes (and their centers) by a common angle: IoU invariant
        phi = 0.7
        c, s = np.cos(phi), np.sin(phi)
        rot = np.array([[c, s], [-s, c]])  # same convention as the kernel
        b1r = b1.copy()
        b2r = b2.copy()
        b1r[:2] = rot @ b1[:2]
        b2r[:2] = rot @ b2[:2]
        b1r[4] += phi
        b2r[4] += phi
        iou_r = rotated_iou_matrix(b1r[None], b2r[None])[0, 0]
        assert iou == pytest.approx(iou_r, abs=1e-6)
        # symmetric
        assert iou == pytest.approx(rotated_iou_matrix(b2[None], b1[None])[0, 0], abs=1e-9)
        assert 0.0 <= iou <= 1.0


def test_rotated_iou_45deg():
    # Unit square vs itself rotated 45deg about common center:
    # intersection is a regular octagon, area 2*(sqrt(2)-1) for unit square.
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    inter = rotated_iou_matrix(a, b, criterion=2)[0, 0]
    assert inter == pytest.approx(2 * (np.sqrt(2) - 1), abs=1e-6)


def test_d3_overlap_identical():
    # [x, y, z, l, h, w, ry], y = bottom face in camera frame
    box = np.array([[1.0, 2.0, 20.0, 3.9, 1.5, 1.6, 0.3]])
    assert d3_box_overlap(box, box)[0, 0] == pytest.approx(1.0, abs=1e-9)
    # disjoint vertically: lift the second box by 2m (y up is negative)
    box2 = box.copy()
    box2[0, 1] -= 5.0
    assert d3_box_overlap(box, box2)[0, 0] == 0.0


def test_convert_to_kitti_roundtrip():
    # Start from KITTI params -> our box (via label parsing math) -> back.
    # alpha = ry - atan2(x, z) = 0.7 + atan2(2.5, 30) ~= 0.78
    label = "Car 0.0 0 0.78 500 150 560 210 1.52 1.61 3.88 -2.5 1.8 30.0 0.7\n"
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "000000.txt")
        with open(p, "w") as f:
            f.write(label)
        annos, _ = parse_label_file(p, ("Car",))
    vec = np.asarray(annos[0]["bbox3d"])
    w, l, h, x, y, z, rot_y, alpha = convert_3d_box_to_kitti(vec[:4], vec[4:7], vec[7:])
    np.testing.assert_allclose([w, l, h], [1.61, 3.88, 1.52], atol=1e-6)
    np.testing.assert_allclose([x, y, z], [-2.5, 1.8, 30.0], atol=1e-6)
    assert rot_y == pytest.approx(0.7, abs=1e-6)
    assert alpha == pytest.approx(0.78, abs=0.02)  # KITTI rounds to 2 decimals


def test_clean_kitti_data_ignore_rules():
    gt = dict(
        name=np.array(["Car", "Van", "Pedestrian", "DontCare"]),
        bbox=np.array([[0, 0, 50, 50], [0, 0, 50, 50], [0, 0, 50, 50], [0, 0, 10, 10]], dtype=np.float64),
        occluded=np.array([0, 0, 0, -1]),
        truncated=np.array([0.0, 0.0, 0.0, -1.0]),
    )
    dt = dict(
        name=np.array(["Car", "Pedestrian"]),
        bbox=np.array([[0, 0, 50, 50], [0, 0, 50, 20]], dtype=np.float64),
    )
    id_to_name = {0: "Car", 1: "Pedestrian"}
    nv, ig, idt, dc = clean_kitti_data(gt, dt, 0, 0, id_to_name)
    assert nv == 1
    assert ig == [0, 1, -1, -1]  # Car valid, Van ignored, Ped other-class, DontCare other
    # NOTE: the reference checks the min-height filter BEFORE the class
    # check (kitti_3d_evaluator.py:735-741), so a too-small det of another
    # class is marked 1 (ignored), not -1.
    assert idt == [0, 1]
    assert len(dc) == 1
    # Pedestrian class: det 2 has height 20 < 40 -> ignored as too small
    nv, ig, idt, dc = clean_kitti_data(gt, dt, 1, 0, id_to_name)
    assert nv == 1
    assert ig == [-1, -1, 0, -1]
    assert idt == [-1, 1]


def _make_anno(engine, boxes_kitti, is_pred):
    return engine.format_annotation(0, boxes_kitti, is_pred)


def test_perfect_predictions_ap_100():
    """Predictions identical to GT must give AP == 100 for every class/
    difficulty/threshold with valid GT."""
    rng = np.random.RandomState(0)
    engine = KITTIEvaluationEngine(id_to_name={0: "Car"}, num_shards=3)
    gt_annos, dt_annos = [], []
    for img in range(12):
        rows_gt, rows_dt = [], []
        for j in range(rng.randint(1, 5)):
            x = rng.uniform(-10, 10)
            z = rng.uniform(10, 50)
            ry = rng.uniform(-np.pi, np.pi)
            h, w, l = 1.5, 1.6, 3.9
            y = 1.7
            # tall 2D box (height 60 > 40) -> valid at every difficulty
            l2, t2 = rng.uniform(0, 1000), rng.uniform(0, 200)
            bbox = [l2, t2, l2 + 80, t2 + 60]
            score = rng.uniform(0.3, 0.9)
            rows_gt.append(["Car", 0.0, 0, 0.0, *bbox, h, w, l, x, y, z, ry])
            rows_dt.append(["Car", -1, -1, 0.0, *bbox, h, w, l, x, y, z, ry, score])
        gt_annos.append(_make_anno(engine, rows_gt, False))
        dt_annos.append(_make_anno(engine, rows_dt, True))

    results = engine.evaluate(gt_annos, dt_annos, [0.5, 0.7])
    for key, val in results.items():
        assert val == pytest.approx(100.0, abs=0.5), f"{key}: {val}"


def test_fp_reduces_precision():
    engine = KITTIEvaluationEngine(id_to_name={0: "Car"}, num_shards=1)
    rows_gt = [["Car", 0.0, 0, 0.0, 100, 100, 180, 160, 1.5, 1.6, 3.9, 0.0, 1.7, 20.0, 0.0]]
    # one TP + one far-away FP with higher score
    rows_dt = [
        ["Car", -1, -1, 0.0, 100, 100, 180, 160, 1.5, 1.6, 3.9, 0.0, 1.7, 20.0, 0.0, 0.8],
        ["Car", -1, -1, 0.0, 300, 100, 380, 160, 1.5, 1.6, 3.9, 8.0, 1.7, 40.0, 0.0, 0.9],
    ]
    gt = [_make_anno(engine, rows_gt, False)]
    dt = [_make_anno(engine, rows_dt, True)]
    results = engine.evaluate(gt, dt, [0.7])
    # recall hits 1 but precision is dragged by the higher-scored FP
    val = results["kitti_box3d_r40/Car_Easy_0.7"]
    assert 0.0 < val < 100.0
