"""Host-side detection postprocess: padded device outputs -> per-image dicts.

The TPU inference path emits fixed-size (B, D) arrays + a valid mask
(dd3d_tpu/models/dd3d.py::dd3d_inference). This module is the equivalent of
detectron2's `detector_postprocess` resize step used by the reference
(tridet/modeling/dd3d/core.py:153-160): rescale 2D boxes from network-input
resolution back to the original image, clip, and unpack 3D boxes into
camera-frame (quat, tvec, size) which are resolution-independent.
"""
from typing import Dict, List

import numpy as np


def unpack_detections(
    det: Dict[str, np.ndarray],
    batch: Dict[str, np.ndarray],
    meta: List[dict],
) -> List[dict]:
    det = {k: np.asarray(v) for k, v in det.items()}
    batch_intrinsics = np.asarray(batch["intrinsics"])
    image_sizes = np.asarray(batch["image_size"])

    out = []
    b = det["valid"].shape[0]
    has_3d = "boxes3d_quat" in det
    for i in range(min(b, len(meta))):
        valid = det["valid"][i]
        n = int(valid.sum())
        sel = np.where(valid)[0]

        cur_h, cur_w = image_sizes[i]
        orig_w = meta[i].get("width") or cur_w
        orig_h = meta[i].get("height") or cur_h
        sx = orig_w / cur_w
        sy = orig_h / cur_h

        boxes2d = det["boxes2d"][i][sel] * np.array([sx, sy, sx, sy])
        boxes2d[:, 0::2] = np.clip(boxes2d[:, 0::2], 0, orig_w)
        boxes2d[:, 1::2] = np.clip(boxes2d[:, 1::2], 0, orig_h)

        item = {
            "image_id": meta[i].get("image_id"),
            "sample_id": meta[i].get("sample_id"),
            "classes": det["classes"][i][sel],
            "scores": det["scores"][i][sel],
            "boxes2d": boxes2d,
            "fpn_levels": det["fpn_levels"][i][sel],
        }
        if "attributes" in det:
            item["attributes"] = det["attributes"][i][sel]
            item["speeds"] = det["speeds"][i][sel]
        if has_3d:
            quat = det["boxes3d_quat"][i][sel]
            proj_ctr = det["boxes3d_proj_ctr"][i][sel]
            depth = det["boxes3d_depth"][i][sel]
            size = det["boxes3d_size"][i][sel]
            inv_k = np.linalg.inv(batch_intrinsics[i])
            rays = np.concatenate([proj_ctr, np.ones_like(depth)], axis=1) @ inv_k.T
            tvec = rays * depth
            item.update(
                {
                    "scores_3d": det["scores_3d"][i][sel],
                    "quat": quat,
                    "tvec": tvec,
                    "size": size,
                    "conf3d": det["conf3d"][i][sel],
                    # 10-D vectorized box like GenericBoxes3D.vectorize()
                    "boxes3d_vec": np.concatenate([quat, tvec, size], axis=1),
                }
            )
        out.append(item)
    return out


def inference_on_dataset(model, cfg, variables, dataloader, evaluators, jit=True,
                         visualize_dir=None, max_vis=8):
    """Run the model over a test dataloader, feed evaluators, return results.
    cf. d2's inference_on_dataset as used in scripts/train.py:231. When
    `visualize_dir` is set, the first `max_vis` images get prediction
    visualizations (projected 3D wireframes + BEV), mirroring the
    rank-0 prediction visualization of the reference (train.py:233-260)."""
    import jax

    from dd3d_tpu.models.dd3d import dd3d_inference

    def infer(variables, images, intrinsics):
        outputs = model.apply(variables, images, train=False)
        return dd3d_inference(cfg, outputs, intrinsics)

    infer_fn = jax.jit(infer) if jit else infer

    for ev in evaluators:
        ev.reset()

    # Overlap host-side mapping/transfer with device inference.
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=2)

    def producer():
        try:
            for item in dataloader:
                q.put(item)
        except Exception as e:
            q.put(e)
        finally:
            q.put(None)

    threading.Thread(target=producer, daemon=True).start()

    n_vis = 0
    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, Exception):
            raise item
        batch, meta = item
        det = infer_fn(variables, batch["image"], batch["intrinsics"])
        det = jax.device_get(det)
        per_image = unpack_detections(det, batch, meta)
        for ev in evaluators:
            ev.process(per_image)
        if visualize_dir is not None and n_vis < max_vis:
            from dd3d_tpu.visualizers.draw import draw_boxes2d, draw_boxes3d, save_vis

            images_np = np.asarray(batch["image"])
            for i, d in enumerate(per_image):
                if n_vis >= max_vis:
                    break
                h, w = np.asarray(batch["image_size"])[i]
                img = images_np[i, :h, :w].astype(np.uint8)
                sx = w / max(meta[i].get("width") or w, 1)
                sy = h / max(meta[i].get("height") or h, 1)
                keep = d["scores"] >= 0.3
                vis = draw_boxes2d(img, d["boxes2d"][keep] * [sx, sy, sx, sy], d["classes"][keep], d["scores"][keep])
                if "quat" in d:
                    vis = draw_boxes3d(vis, d["quat"][keep], d["tvec"][keep], d["size"][keep],
                                       np.asarray(batch["intrinsics"])[i], d["classes"][keep])
                save_vis(vis, visualize_dir, f"pred_{d['image_id']}")
                n_vis += 1

    results = {}
    for ev in evaluators:
        r = ev.evaluate()
        if r:
            results.update(r)
    return results
