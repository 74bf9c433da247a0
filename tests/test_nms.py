import numpy as np
import jax
import jax.numpy as jnp

from dd3d_tpu.ops.nms import NEG_INF, batched_nms_padded, greedy_suppress, pairwise_iou_xyxy


def np_iou(a, b):
    x1 = np.maximum(a[0], b[0])
    y1 = np.maximum(a[1], b[1])
    x2 = np.minimum(a[2], b[2])
    y2 = np.minimum(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / max(area_a + area_b - inter, 1e-9)


def np_greedy_nms(boxes, scores, classes, thresh):
    """Oracle: sequential class-aware greedy NMS, returns kept input indices."""
    order = np.argsort(-scores)
    keep = []
    for i in order:
        if scores[i] <= NEG_INF / 2:
            continue
        ok = True
        for j in keep:
            if classes[i] == classes[j] and np_iou(boxes[i], boxes[j]) > thresh:
                ok = False
                break
        if ok:
            keep.append(i)
    return keep


def test_pairwise_iou(rng):
    boxes = rng.rand(20, 4) * 100
    boxes[:, 2:] = boxes[:, :2] + rng.rand(20, 2) * 50 + 1
    iou = np.asarray(pairwise_iou_xyxy(jnp.asarray(boxes), jnp.asarray(boxes)))
    for i in range(20):
        for j in range(20):
            assert abs(iou[i, j] - np_iou(boxes[i], boxes[j])) < 1e-5


def test_nms_matches_oracle(rng):
    for trial in range(5):
        n = 200
        boxes = rng.rand(n, 4) * 200
        boxes[:, 2:] = boxes[:, :2] + rng.rand(n, 2) * 80 + 1
        scores = rng.rand(n).astype(np.float32)
        classes = rng.randint(0, 3, size=n)
        # pad some invalid entries
        scores[-20:] = NEG_INF

        order, keep = batched_nms_padded(
            jnp.asarray(boxes, dtype=jnp.float32), jnp.asarray(scores), jnp.asarray(classes), 0.5, max_outputs=n
        )
        kept_ours = sorted(np.asarray(order)[np.asarray(keep)].tolist())
        kept_oracle = sorted(np_greedy_nms(boxes, scores, classes, 0.5))
        assert kept_ours == kept_oracle, f"trial {trial}"


def test_nms_max_outputs(rng):
    n = 50
    # Non-overlapping boxes: all survive NMS; max_outputs caps to top-k.
    boxes = np.zeros((n, 4), dtype=np.float32)
    for i in range(n):
        boxes[i] = [i * 100, 0, i * 100 + 50, 50]
    scores = rng.rand(n).astype(np.float32)
    classes = np.zeros(n, dtype=np.int64)
    order, keep = batched_nms_padded(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes), 0.5, max_outputs=10)
    kept = np.asarray(order)[np.asarray(keep)]
    assert len(kept) == 10
    top10 = np.argsort(-scores)[:10]
    assert sorted(kept.tolist()) == sorted(top10.tolist())
