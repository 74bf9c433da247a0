import numpy as np
import jax.numpy as jnp

from dd3d_tpu.ops.nms import greedy_suppress, pairwise_iou_xyxy
from dd3d_tpu.ops.pallas_nms import pallas_greedy_nms_batched


def test_pallas_nms_matches_xla(rng):
    b, n = 2, 128
    boxes = rng.rand(b, n, 4).astype(np.float32) * 200
    boxes[..., 2:] = boxes[..., :2] + rng.rand(b, n, 2).astype(np.float32) * 80 + 1
    scores = rng.rand(b, n)
    order = np.argsort(-scores, axis=1)
    boxes = np.take_along_axis(boxes, order[..., None], axis=1)
    valid = np.ones((b, n), bool)
    valid[:, -10:] = False

    keep_p = np.asarray(pallas_greedy_nms_batched(jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True))
    for i in range(b):
        iou = pairwise_iou_xyxy(jnp.asarray(boxes[i]), jnp.asarray(boxes[i]))
        keep_x = np.asarray(greedy_suppress(iou, jnp.asarray(valid[i]), 0.5))
        assert (keep_p[i] == keep_x).all()
