"""Adversarial/mutation hardening of the native nuScenes metrics engine
(VERDICT round-2 item 7): devkit `accumulate`/`calc_ap`/`calc_tp` edge cases
as hand-computed fixtures, plus a seeded-mutation check that every input
field perturbation moves a metric.

Devkit semantics referenced: nuscenes/eval/detection/algo.py (accumulate,
calc_ap, calc_tp), loaders.filter_eval_boxes — as vendored/patched by the
reference (tridet/evaluators/nuscenes_evaluator.py:73-128).
"""
import numpy as np
import pytest

from dd3d_tpu.evaluators.nuscenes_metrics import (
    CLASS_RANGE,
    DIST_THS,
    MetricData,
    accumulate,
    calc_ap,
    calc_tp,
    compute_detection_metrics,
    filter_boxes,
    _cummean,
)


def _gt(x, y, name="car", attr="vehicle.parked", vel=(0.0, 0.0), size=(2.0, 4.5, 1.6), yaw=0.0, **kw):
    d = {
        "translation": [x, y, 0.0], "size": list(size), "yaw": yaw,
        "velocity": list(vel), "detection_name": name, "attribute_name": attr,
        "ego_translation": [0.0, 0.0],
    }
    d.update(kw)
    return d


def _pred(x, y, score, name="car", attr="vehicle.parked", vel=(0.0, 0.0), size=(2.0, 4.5, 1.6), yaw=0.0):
    d = _gt(x, y, name=name, attr=attr, vel=vel, size=size, yaw=yaw)
    d["detection_score"] = score
    return d


def test_duplicate_detections_within_sample():
    """Two preds on one GT: greedy matching takes the higher-scored one; the
    duplicate becomes an FP even though it is closer than dist_th."""
    gt = {"s0": [_gt(10, 0)]}
    pred = {"s0": [_pred(10.1, 0, 0.9), _pred(10.05, 0, 0.8)]}
    md = accumulate(gt, pred, "car", 2.0)
    # one TP at conf 0.9 then one FP: precision drops 1.0 -> 0.5, recall 1.0
    # at the first pred already. AP = mean over recall grid above 0.1 of
    # (1.0 - 0.1)/0.9 for recall <= 1.0... hand-compute:
    # rec = [1.0, 1.0], prec = [1.0, 0.5]; np.interp on non-increasing x
    # uses the LAST y at x=1.0 -> the interpolated curve is 0.5 at
    # recall grid 1.0, and prec[0]=1.0 applies below. Check AP against a
    # direct transcription:
    grid = np.linspace(0, 1, 101)
    prec_i = np.interp(grid, [1.0, 1.0], [1.0, 0.5], right=0)
    expect_ap = float(np.mean(np.clip(prec_i[11:] - 0.1, 0, None))) / 0.9
    assert calc_ap(md) == pytest.approx(expect_ap)
    # the duplicate did NOT steal the GT: exactly one TP-error sample exists
    assert md.errs["trans_err"][md.max_recall_ind] == pytest.approx(
        np.hypot(0.1, 0.0), abs=1e-9
    )


def test_equal_score_tie_order_matches_devkit():
    """Devkit sorts ascending by (score, insertion index) then reverses:
    tied scores evaluate LAST-inserted first. With one GT and two tied preds
    at different distances, the devkit matches the later-inserted one."""
    gt = {"s0": [_gt(0, 0)]}
    # same score; first-inserted is closer
    pred = {"s0": [_pred(0.1, 0, 0.5), _pred(1.5, 0, 0.5)]}
    md = accumulate(gt, pred, "car", 2.0)
    # later-inserted (dist 1.5) matches first -> its trans_err is recorded
    assert md.errs["trans_err"][md.max_recall_ind] == pytest.approx(1.5, abs=1e-9)


def test_zero_tp_class_gives_no_predictions_curve():
    """All preds beyond dist_th: AP == 0 and every TP error == 1.0 (the
    devkit's no_predictions sentinel + calc_tp last<first branch)."""
    gt = {"s0": [_gt(0, 0)]}
    pred = {"s0": [_pred(30, 30, 0.9)]}
    md = accumulate(gt, pred, "car", 2.0)
    assert calc_ap(md) == 0.0
    for m in ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err"):
        assert calc_tp(md, m) == 1.0


def test_boundary_distance_is_not_a_match():
    """min_dist < dist_th is STRICT: a pred at exactly dist_th is an FP."""
    gt = {"s0": [_gt(0, 0)]}
    for dist_th in DIST_THS:
        pred = {"s0": [_pred(dist_th, 0, 0.9)]}
        md = accumulate(gt, pred, "car", dist_th)
        assert calc_ap(md) == 0.0, f"dist_th={dist_th}"
        pred = {"s0": [_pred(np.nextafter(dist_th, 0), 0, 0.9)]}
        md = accumulate(gt, pred, "car", dist_th)
        assert calc_ap(md) > 0.9, f"dist_th={dist_th}"


def test_class_range_filter_strict_and_num_pts():
    """filter_eval_boxes: strict < on the class range; GT with num_pts == 0
    removed; num_pts absent means keep."""
    rng = CLASS_RANGE["car"]
    boxes = {
        "s0": [
            _gt(rng, 0),                      # exactly at range -> dropped
            _gt(np.nextafter(rng, 0), 0),     # just inside -> kept
            _gt(1, 0, num_pts=0),             # point-free GT -> dropped
            _gt(2, 0, num_pts=3),             # kept
            _gt(3, 0),                        # no num_pts key -> kept
        ]
    }
    kept = filter_boxes(boxes)["s0"]
    assert len(kept) == 3
    assert [b["translation"][0] for b in kept] == [np.nextafter(rng, 0), 2, 3]


def test_cummean_nan_handling():
    # attr_err NaN rows (missing GT attribute) are skipped by the running
    # mean; all-NaN input yields the devkit's ones sentinel
    x = np.array([np.nan, 1.0, np.nan, 0.0])
    np.testing.assert_allclose(_cummean(x), [0.0, 1.0, 1.0, 0.5])
    np.testing.assert_allclose(_cummean(np.array([np.nan, np.nan])), [1.0, 1.0])


def test_attribute_ignore_rows_follow_devkit_cummean():
    """GT without attribute_name contributes NaN attr_err. Devkit cummean
    emits 0.0 at a leading all-NaN prefix (0/0 with out=0), so the early
    high-confidence part of the curve reads 0, NOT the later match's 1.0.
    Hand derivation: npos=2, TPs at conf .9/.8, attr errs [NaN, 1.0] ->
    cummean [0, 1]; the interpolated error is 0 for recall in [0.11, 0.5)
    (39 grid points) and 2(r - 0.5) on [0.5, 1.0] (51 points, mean 0.5):
    calc_tp = 51 * 0.5 / 90."""
    gt = {"s0": [_gt(0, 0, attr=""), _gt(10, 0, attr="vehicle.moving")]}
    pred = {"s0": [_pred(0, 0, 0.9, attr="vehicle.parked"),
                   _pred(10, 0, 0.8, attr="vehicle.parked")]}
    md = accumulate(gt, pred, "car", 2.0)
    assert calc_tp(md, "attr_err") == pytest.approx(51 * 0.5 / 90)


def test_per_class_tp_exclusions():
    """traffic_cone excludes attr/vel/orient errors; barrier attr/vel — the
    excluded entries are NaN per class and drop out of the nanmean."""
    gt = {"s0": [_gt(1, 0, name="traffic_cone", attr=""), _gt(5, 0, name="barrier", attr="")]}
    pred = {"s0": [_pred(1, 0, 0.9, name="traffic_cone", attr=""),
                   _pred(5, 0, 0.8, name="barrier", attr="")]}
    out = compute_detection_metrics(gt, pred, ["traffic_cone", "barrier"])
    for k in ("mAOE_traffic_cone", "mAVE_traffic_cone", "mAAE_traffic_cone",
              "mAVE_barrier", "mAAE_barrier"):
        assert np.isnan(out[k]), k
    # barrier orientation error uses period pi and IS included
    assert not np.isnan(out["mAOE_barrier"])
    # perfect matches -> NDS = (5 * 1 + sum of included tp scores) / 10
    assert out["mAP"] == pytest.approx(1.0)


def test_barrier_orientation_period_pi():
    """A barrier rotated by pi has zero orientation error (period pi); a car
    rotated by pi has the maximal error pi."""
    for name, expect in (("barrier", 0.0), ("car", np.pi)):
        gt = {"s0": [_gt(0, 0, name=name, attr="")]}
        pred = {"s0": [_pred(0, 0, 0.9, name=name, attr="", yaw=np.pi)]}
        md = accumulate(gt, pred, name, 2.0)
        assert calc_tp(md, "orient_err") == pytest.approx(expect, abs=1e-9), name


def _golden_scene(seed=0):
    rng = np.random.RandomState(seed)
    gt, pred = {}, {}
    for s in range(3):
        tok = f"s{s}"
        gt[tok], pred[tok] = [], []
        for i in range(4):
            x, y = rng.uniform(-30, 30, 2)
            yaw = rng.uniform(-np.pi, np.pi)
            vel = rng.uniform(-3, 3, 2)
            g = _gt(x, y, yaw=yaw, vel=vel)
            gt[tok].append(g)
            if rng.rand() < 0.85:  # matched pred with noise
                pred[tok].append(_pred(
                    x + rng.randn() * 0.4, y + rng.randn() * 0.4, float(rng.rand()),
                    yaw=yaw + rng.randn() * 0.1, vel=vel + rng.randn(2) * 0.2,
                    attr="vehicle.parked" if rng.rand() < 0.8 else "vehicle.moving",
                ))
        for _ in range(2):  # spurious
            pred[tok].append(_pred(*rng.uniform(-40, 40, 2), float(rng.rand())))
    return gt, pred


MUTATIONS = [
    ("score", lambda p: p.__setitem__("detection_score", min(1.0, p["detection_score"] + 0.3))),
    ("translation", lambda p: p.__setitem__("translation", [p["translation"][0] + 1.5,
                                                            p["translation"][1], 0.0])),
    ("size", lambda p: p.__setitem__("size", [s * 1.5 for s in p["size"]])),
    ("yaw", lambda p: p.__setitem__("yaw", p["yaw"] + 0.7)),
    ("velocity", lambda p: p.__setitem__("velocity", [p["velocity"][0] + 2.0, p["velocity"][1]])),
    ("attribute", lambda p: p.__setitem__("attribute_name", "vehicle.moving"
                                          if p["attribute_name"] != "vehicle.moving" else "vehicle.parked")),
]


@pytest.mark.parametrize("field,mutate", MUTATIONS, ids=[m[0] for m in MUTATIONS])
def test_seeded_mutation_moves_a_metric(field, mutate):
    """Perturbing any single input field of one matched prediction must move
    at least one reported metric — the goldens are not insensitive."""
    gt, pred = _golden_scene()
    base = compute_detection_metrics(gt, pred, ["car"])

    gt2, pred2 = _golden_scene()
    # mutate the first matched (close-to-GT) prediction
    tgt = pred2["s0"][0]
    mutate(tgt)
    got = compute_detection_metrics(gt2, pred2, ["car"])

    moved = [k for k in base
             if np.isfinite(base[k]) and np.isfinite(got[k]) and abs(base[k] - got[k]) > 1e-9]
    assert moved, f"mutating {field} moved no metric"


def test_metric_data_no_predictions_shape():
    md = MetricData.no_predictions()
    assert md.max_recall_ind == 0
    assert calc_ap(md) == 0.0
