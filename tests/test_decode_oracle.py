"""Golden test: the shape-static decode+NMS must reproduce a direct numpy
transcription of the reference's dynamic inference semantics
(tridet/modeling/dd3d/fcos2d.py:242-367) on random head outputs."""
import numpy as np
import jax.numpy as jnp
import pytest

from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.models.dd3d import dd3d_inference
from dd3d_tpu.ops.locations import compute_feature_locations


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def reference_decode_numpy(cfg, outputs, num_classes):
    """Per-image dynamic decode, transcribed from the reference:
    sigmoid -> (optionally ctr-multiplied) threshold -> per-level topk ->
    box decode -> sqrt score -> class-aware greedy NMS -> post topk."""
    inf2d = cfg.DD3D.FCOS2D.INFERENCE
    strides = [2 ** (3 + i) for i in range(len(outputs["logits"]))]
    b = outputs["logits"][0].shape[0]
    results = []
    for i in range(b):
        cand = []  # (score, box, cls)
        for l, stride in enumerate(strides):
            logits = np.asarray(outputs["logits"][l][i], np.float64)
            reg = np.asarray(outputs["box2d_reg"][l][i], np.float64)
            ctr = np.asarray(outputs["centerness"][l][i], np.float64)
            h, w, c = logits.shape
            loc = np.asarray(compute_feature_locations(h, w, stride))
            scores = _sigmoid(logits.reshape(-1, c))
            ctrs = _sigmoid(ctr.reshape(-1, 1))
            reg = reg.reshape(-1, 4)
            if inf2d.THRESH_WITH_CTR:
                scores = scores * ctrs
                mask = scores > inf2d.PRE_NMS_THRESH
            else:
                mask = scores > inf2d.PRE_NMS_THRESH
                scores = scores * ctrs
            fg, cls = np.nonzero(mask)
            svals = scores[fg, cls]
            # per-level topk (reference pre_nms_topk; our static K per level)
            k = min(len(svals), cfg.TPU.PRE_NMS_CANDIDATES_PER_LEVEL)
            order = np.argsort(-svals)[:k]
            for j in order:
                p, q = fg[j], cls[j]
                box = [loc[p, 0] - reg[p, 0], loc[p, 1] - reg[p, 1],
                       loc[p, 0] + reg[p, 2], loc[p, 1] + reg[p, 3]]
                cand.append((np.sqrt(svals[j]), box, q))
        # class-aware greedy NMS
        cand.sort(key=lambda t: -t[0])
        kept = []
        for s, box, q in cand:
            ok = True
            for s2, box2, q2 in kept:
                if q != q2:
                    continue
                x1, y1 = max(box[0], box2[0]), max(box[1], box2[1])
                x2, y2 = min(box[2], box2[2]), min(box[3], box2[3])
                inter = max(0, x2 - x1) * max(0, y2 - y1)
                a1 = (box[2] - box[0]) * (box[3] - box[1])
                a2 = (box2[2] - box2[0]) * (box2[3] - box2[1])
                if inter / max(a1 + a2 - inter, 1e-9) > inf2d.NMS_THRESH:
                    ok = False
                    break
            if ok:
                kept.append((s, box, q))
        kept = kept[: inf2d.POST_NMS_TOPK]
        results.append(kept)
    return results


def test_static_decode_matches_dynamic_oracle(rng):
    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    cfg.MODEL.BOX3D_ON = False  # isolate the 2D decode semantics
    cfg.TPU.USE_APPROX_TOPK = False  # exact top-k for bitwise candidate parity
    c = cfg.DD3D.NUM_CLASSES
    b = 2
    shapes = [(8, 16), (4, 8), (2, 4), (1, 2), (1, 1)]
    outputs = {
        # offset so a moderate number of candidates clear the 0.05 threshold
        "logits": [jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 2 - 2) for h, w in shapes],
        "box2d_reg": [jnp.asarray(np.abs(rng.randn(b, h, w, 4)).astype(np.float32) * 20) for h, w in shapes],
        "centerness": [jnp.asarray(rng.randn(b, h, w, 1).astype(np.float32)) for h, w in shapes],
    }

    det = dd3d_inference(cfg, outputs, None)
    oracle = reference_decode_numpy(cfg, outputs, c)

    for i in range(b):
        valid = np.asarray(det["valid"][i])
        ours = sorted(
            zip(np.asarray(det["scores"][i])[valid].tolist(),
                np.asarray(det["classes"][i])[valid].tolist()),
            key=lambda t: -t[0],
        )
        ref = sorted(((s, int(q)) for s, _box, q in oracle[i]), key=lambda t: -t[0])
        assert len(ours) == len(ref), f"img {i}: {len(ours)} vs {len(ref)} detections"
        for (s1, q1), (s2, q2) in zip(ours, ref):
            assert q1 == q2
            assert s1 == pytest.approx(s2, abs=1e-4)
        # boxes match for the top detection
        if ref:
            top_ref_box = max(oracle[i], key=lambda t: t[0])[1]
            top_idx = int(np.argmax(np.where(valid, np.asarray(det["scores"][i]), -1)))
            np.testing.assert_allclose(np.asarray(det["boxes2d"][i][top_idx]), top_ref_box, atol=1e-3)


def test_gather_fields_matches_per_field_take(rng):
    """models/dd3d.py::_gather_fields packs every per-candidate field into
    one row gather (the round-5 decode optimization). Pin that it equals
    per-field take_along_axis exactly, across dtypes (f32 / int32 / bool)
    and ranks (2-D and 3-D fields)."""
    import jax.numpy as jnp

    from dd3d_tpu.models.dd3d import _gather_fields

    b, n, k = 3, 37, 11
    d = {
        "score": jnp.asarray(rng.randn(b, n).astype(np.float32)) * 1e10,
        "box": jnp.asarray(rng.randn(b, n, 4).astype(np.float32)),
        "cls": jnp.asarray(rng.randint(0, 19, (b, n)).astype(np.int32)),
        "valid": jnp.asarray(rng.rand(b, n) > 0.5),
        "quat": jnp.asarray(rng.randn(b, n, 4).astype(np.float32)),
        "fpn_level": jnp.asarray(rng.randint(0, 5, (b, n)).astype(np.int32)),
    }
    idx = jnp.asarray(np.stack([rng.permutation(n)[:k] for _ in range(b)]).astype(np.int32))
    out = _gather_fields(d, idx)
    assert set(out) == set(d)
    for key, v in d.items():
        if v.ndim == 3:
            ref = jnp.take_along_axis(v, idx[..., None], axis=1)
        else:
            ref = jnp.take_along_axis(v, idx, axis=1)
        assert out[key].dtype == v.dtype, key
        np.testing.assert_array_equal(np.asarray(out[key]), np.asarray(ref), err_msg=key)
