"""Randomized A/B of evaluators/coco2d.py against an independent
transcription of pycocotools' COCOeval bbox protocol (VERDICT round-2
item 9).

The oracle below re-implements cocoeval.evaluateImg/accumulate/summarize
directly (per-threshold matching loops, per-maxDets evaluation — no shared
matching or prefix-slicing tricks), so an error in either implementation
breaks the A/B. Covers: area ranges (small/medium/large straddling boxes),
maxDets 1/10/100, empty images, classes without GT, detections on GT-less
images, duplicate detections, >100 detections per image.

iscrowd is N/A by construction: neither pipeline ever produces crowd
annotations (the reference mapper drops iscrowd != 0,
tridet/data/dataset_mappers/dataset_mapper.py:184, and the COCO caches write
iscrowd=0, tridet/utils/coco.py:121).
"""
from collections import defaultdict

import numpy as np
import pytest

from dd3d_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from dd3d_tpu.evaluators.coco2d import COCO2DEvaluator

IOU_THRS = np.round(np.arange(0.5, 0.951, 0.05), 2)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = [("all", 0.0, 1e10), ("small", 0.0, 32.0 ** 2),
             ("medium", 32.0 ** 2, 96.0 ** 2), ("large", 96.0 ** 2, 1e10)]
MAX_DETS = [1, 10, 100]


# --------------------------------------------------------------------------
# Oracle: direct COCOeval transcription
# --------------------------------------------------------------------------

def _iou(d, g):
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    x1 = np.maximum(d[:, None, 0], g[None, :, 0])
    y1 = np.maximum(d[:, None, 1], g[None, :, 1])
    x2 = np.minimum(d[:, None, 2], g[None, :, 2])
    y2 = np.minimum(d[:, None, 3], g[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    ad = (d[:, 2] - d[:, 0]) * (d[:, 3] - d[:, 1])
    ag = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
    return inter / np.maximum(ad[:, None] + ag[None] - inter, 1e-12)


def _evaluate_img(gt_boxes, dt_boxes, dt_scores, arng, max_det):
    """cocoeval.evaluateImg for bbox, iscrowd absent."""
    lo, hi = arng
    garea = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1]) if len(gt_boxes) else np.zeros(0)
    gt_ig = (garea < lo) | (garea > hi)
    gind = np.argsort(gt_ig, kind="mergesort")
    gt_boxes, gt_ig = gt_boxes[gind], gt_ig[gind]

    dind = np.argsort(-dt_scores, kind="mergesort")[:max_det]
    dt_boxes, dt_scores = dt_boxes[dind], dt_scores[dind]
    darea = (dt_boxes[:, 2] - dt_boxes[:, 0]) * (dt_boxes[:, 3] - dt_boxes[:, 1]) if len(dt_boxes) else np.zeros(0)

    ious = _iou(dt_boxes, gt_boxes)
    T, D, G = len(IOU_THRS), len(dt_boxes), len(gt_boxes)
    gtm = np.zeros((T, G), dtype=np.int64) - 1
    dtm = np.zeros((T, D), dtype=np.int64) - 1
    dt_ig_out = np.zeros((T, D), dtype=bool)
    for t_i, t in enumerate(IOU_THRS):
        for d in range(D):
            iou_best = min(t, 1 - 1e-10)
            m = -1
            for g in range(G):
                if gtm[t_i, g] >= 0:
                    continue
                if m > -1 and not gt_ig[m] and gt_ig[g]:
                    break
                if ious[d, g] < iou_best:
                    continue
                iou_best = ious[d, g]
                m = g
            if m == -1:
                continue
            dtm[t_i, d] = m
            gtm[t_i, m] = d
            dt_ig_out[t_i, d] = gt_ig[m]
        dt_ig_out[t_i] |= (dtm[t_i] == -1) & ((darea < lo) | (darea > hi))
    npig = int((~gt_ig).sum())
    return dt_scores, dtm >= 0, dt_ig_out, npig


def oracle_eval(gt_by_class_img, dt_by_class_img, class_names):
    """Full accumulate + summarize. Returns the same result keys as
    COCO2DEvaluator.evaluate()['bbox']."""
    # precision[t, r, k, a, m], recall[t, k, a, m]
    K = len(class_names)
    prec = -np.ones((len(IOU_THRS), len(REC_THRS), K, len(AREA_RNGS), len(MAX_DETS)))
    rec = -np.ones((len(IOU_THRS), K, len(AREA_RNGS), len(MAX_DETS)))
    for k in range(K):
        gt_imgs = gt_by_class_img.get(k, {})
        dt_imgs = dt_by_class_img.get(k, {})
        img_ids = sorted(set(gt_imgs) | set(dt_imgs))
        for a_i, (_aname, lo, hi) in enumerate(AREA_RNGS):
            for m_i, max_det in enumerate(MAX_DETS):
                per_img = []
                for img in img_ids:
                    g = np.asarray(gt_imgs.get(img, np.zeros((0, 4))), dtype=np.float64).reshape(-1, 4)
                    db, ds = dt_imgs.get(img, (np.zeros((0, 4)), np.zeros(0)))
                    per_img.append(_evaluate_img(
                        g, np.asarray(db, np.float64).reshape(-1, 4),
                        np.asarray(ds, np.float64), (lo, hi), max_det))
                npig = sum(p[3] for p in per_img)
                if npig == 0:
                    continue
                scores = np.concatenate([p[0] for p in per_img]) if per_img else np.zeros(0)
                order = np.argsort(-scores, kind="mergesort")
                for t_i in range(len(IOU_THRS)):
                    m = np.concatenate([p[1][t_i] for p in per_img])[order]
                    ig = np.concatenate([p[2][t_i] for p in per_img])[order]
                    tps = m & ~ig
                    fps = ~m & ~ig
                    tp = np.cumsum(tps).astype(np.float64)
                    fp = np.cumsum(fps).astype(np.float64)
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / np.maximum(fp + tp, np.spacing(1))
                    rec[t_i, k, a_i, m_i] = rc[-1] if nd else 0.0
                    q = np.zeros(len(REC_THRS))
                    pr = pr.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds = np.searchsorted(rc, REC_THRS, side="left")
                    for ri, pi in enumerate(inds):
                        if pi < nd:
                            q[ri] = pr[pi]
                    prec[t_i, :, k, a_i, m_i] = q

    def _s_ap(a_i, m_i, t_i=None):
        p = prec[:, :, :, a_i, m_i] if t_i is None else prec[t_i:t_i + 1, :, :, a_i, m_i]
        p = p[p > -1]
        return float(np.mean(p) * 100) if p.size else float("nan")

    def _s_ar(a_i, m_i):
        r = rec[:, :, a_i, m_i]
        r = r[r > -1]
        return float(np.mean(r) * 100) if r.size else float("nan")

    out = {
        "AP": _s_ap(0, 2), "AP50": _s_ap(0, 2, 0), "AP75": _s_ap(0, 2, 5),
        "APs": _s_ap(1, 2), "APm": _s_ap(2, 2), "APl": _s_ap(3, 2),
        "AR@1": _s_ar(0, 0), "AR@10": _s_ar(0, 1), "AR@100": _s_ar(0, 2),
        "ARs": _s_ar(1, 2), "ARm": _s_ar(2, 2), "ARl": _s_ar(3, 2),
    }
    for k, name in enumerate(class_names):
        p = prec[:, :, k, 0, 2]
        p = p[p > -1]
        if p.size:
            out[f"AP-{name}"] = float(np.mean(p) * 100)
    return out


# --------------------------------------------------------------------------
# Randomized A/B
# --------------------------------------------------------------------------

def _random_scene(seed, n_images=6, n_classes=3):
    """GT + detections with boxes spanning every area bucket, noisy/duplicate
    /spurious detections, one empty image, one GT-less detection image."""
    rng = np.random.RandomState(seed)
    gt, dt = [], []
    for img in range(n_images):
        img_id = f"im{img}"
        annos = []
        if img != n_images - 2:  # one image with zero GT
            for _ in range(rng.randint(1, 6)):
                # side distribution crossing 32 and 96 px area boundaries
                w = float(rng.choice([8, 20, 40, 90, 150]) * rng.uniform(0.7, 1.3))
                h = float(rng.choice([8, 20, 40, 90, 150]) * rng.uniform(0.7, 1.3))
                x, y = rng.uniform(0, 300, 2)
                annos.append({"category_id": int(rng.randint(0, n_classes)),
                              "bbox": [x, y, x + w, y + h]})
        gt.append({"image_id": img_id, "annotations": annos})

        dets = {"image_id": img_id, "classes": [], "scores": [], "boxes2d": []}
        for a in annos:
            for _ in range(rng.randint(0, 3)):  # 0-2 noisy copies incl. duplicates
                b = np.asarray(a["bbox"]) + rng.randn(4) * rng.choice([0.5, 5.0, 25.0])
                b[2] = max(b[2], b[0] + 1)
                b[3] = max(b[3], b[1] + 1)
                cls = a["category_id"] if rng.rand() < 0.8 else rng.randint(0, n_classes)
                dets["classes"].append(cls)
                dets["scores"].append(float(rng.rand()))
                dets["boxes2d"].append(b)
        n_spurious = rng.randint(0, 4) if img != n_images - 1 else 120  # >100 dets once
        for _ in range(n_spurious):
            x, y = rng.uniform(0, 300, 2)
            w, h = rng.uniform(5, 120, 2)
            dets["classes"].append(int(rng.randint(0, n_classes)))
            dets["scores"].append(float(rng.rand()))
            dets["boxes2d"].append(np.array([x, y, x + w, y + h]))
        dt.append({k: np.asarray(v) if k != "image_id" else v for k, v in dets.items()})
    return gt, dt


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_coco_ab_randomized(seed):
    name = f"coco_ab_{seed}"
    gt_dicts, det_dicts = _random_scene(seed)
    class_names = ["a", "b", "c"]
    if name not in DatasetCatalog.list():
        DatasetCatalog.register(name, lambda d=gt_dicts: d)
        MetadataCatalog.get(name)["thing_classes"] = class_names

    ev = COCO2DEvaluator(name)
    ev.process(det_dicts)
    got = ev.evaluate()["bbox"]

    # oracle inputs: class -> img -> boxes / (boxes, scores)
    gt_ci = defaultdict(dict)
    for d in gt_dicts:
        for a in d["annotations"]:
            gt_ci[a["category_id"]].setdefault(d["image_id"], []).append(a["bbox"])
    gt_ci = {c: {i: np.asarray(v) for i, v in imgs.items()} for c, imgs in gt_ci.items()}
    dt_ci = defaultdict(dict)
    for d in det_dicts:
        for i in range(len(d["classes"])):
            c = int(d["classes"][i])
            entry = dt_ci[c].setdefault(d["image_id"], ([], []))
            entry[0].append(d["boxes2d"][i])
            entry[1].append(float(d["scores"][i]))
    want = oracle_eval(gt_ci, dt_ci, class_names)

    assert set(got) == set(want)
    for k in want:
        if np.isnan(want[k]):
            assert np.isnan(got[k]), k
        else:
            np.testing.assert_allclose(got[k], want[k], atol=1e-8, err_msg=k)
