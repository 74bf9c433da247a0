#!/usr/bin/env python
"""Batch-inference (serving) CLI: raw images in, detections out.

The reference only ships train/eval drivers bound to registered datasets;
this is the deployment-shaped entry point: point it at a directory of
images (one camera, known intrinsics), get padded-static-shape batched
TPU inference and a JSON of 3D detections (+ optional wireframe/BEV PNGs).

    python scripts/predict.py --experiment dd3d_kitti_dla34 \
        --ckpt /path/model_final.pth --images /data/frames \
        --intrinsics 721.5,721.5,609.5,172.8 --out preds.json [--vis out_vis]

Implementation notes:
- images resize through the SAME eval transform stack as scripts/train.py
  (ResizeShortestEdge at INPUT.RESIZE.MIN_SIZE_TEST, intrinsics rescaled);
- batches pad to one static canvas (pad_to_divisibility), so with a fixed
  camera everything after the first batch reuses one compiled program;
- a ragged final batch is padded by repeating the last sample — the extra
  rows are dropped by unpack_detections (len(meta) bound);
- detections come out in ORIGINAL image coordinates (unpack_detections
  rescales), scores are the NMS-surviving per-box 2D scores plus the
  fused 3D score, boxes3d as (quat wxyz, tvec, size lwh).
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

KITTI_CLASSES = ["Car", "Pedestrian", "Cyclist", "Van", "Truck"]


def parse_intrinsics(spec: str) -> np.ndarray:
    """"fx,fy,cx,cy" or a path to a JSON file holding a 3x3 (or fx/fy/cx/cy)."""
    if os.path.exists(spec):
        data = json.load(open(spec))
        if isinstance(data, dict):
            return np.array(
                [[data["fx"], 0, data["cx"]], [0, data["fy"], data["cy"]], [0, 0, 1]], np.float64
            )
        return np.asarray(data, np.float64).reshape(3, 3)
    fx, fy, cx, cy = (float(v) for v in spec.split(","))
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)


def list_images(spec: str):
    if os.path.isdir(spec):
        files = sorted(
            f for ext in ("*.png", "*.jpg", "*.jpeg", "*.PNG", "*.JPG")
            for f in glob.glob(os.path.join(spec, ext))
        )
    else:
        files = sorted(glob.glob(spec))
    if not files:
        raise FileNotFoundError(f"no images match {spec!r}")
    return files


def restore_variables(cfg, model, ckpt_path):
    """Init + restore (parity with the EVAL_ONLY path, scripts/train.py)."""
    import jax
    import jax.numpy as jnp

    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )
    if not ckpt_path:
        return variables
    if ckpt_path.endswith((".pth", ".pt")) or ckpt_path.startswith(("http", "s3://", "gs://")):
        import torch

        from dd3d_tpu.utils.convert_checkpoint import convert_torch_state_dict
        from dd3d_tpu.utils.s3 import maybe_download_ckpt

        sd = torch.load(maybe_download_ckpt(ckpt_path), map_location="cpu")
        sd = sd.get("model", sd) if isinstance(sd, dict) else sd
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        params, batch_stats = convert_torch_state_dict(sd, variables)
        return {"params": params, "batch_stats": batch_stats}
    if os.path.isdir(ckpt_path):
        from dd3d_tpu.training.checkpoint import CheckpointManager
        from dd3d_tpu.training.optim import build_optimizer
        from dd3d_tpu.training.train_step import TrainState

        tx = build_optimizer(cfg, variables["params"])
        st = TrainState.create(variables["params"], variables.get("batch_stats", {}), tx)
        st = CheckpointManager(ckpt_path).restore(st)
        return {"params": st.params, "batch_stats": st.batch_stats}
    raise ValueError(f"unrecognized --ckpt {ckpt_path!r}")


def main():
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--experiment", required=True)
    ap.add_argument("--images", required=True, help="directory or glob of input images")
    ap.add_argument("--intrinsics", required=True, help='"fx,fy,cx,cy" or JSON file')
    ap.add_argument("--ckpt", default=None, help=".pth (reference) or orbax dir")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="predictions.json")
    ap.add_argument("--vis", default=None, help="directory for wireframe+BEV PNGs")
    ap.add_argument("--score-thresh", type=float, default=0.0)
    ap.add_argument("overrides", nargs="*", help="KEY=VALUE config overrides")
    args = ap.parse_args()

    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.data.augmentations import build_augmentation
    from dd3d_tpu.data.mapper import DatasetMapper, collate_batch
    from dd3d_tpu.models import build_model
    from dd3d_tpu.models.postprocess import get_inference_fn, unpack_detections

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train import parse_overrides

    cfg = get_experiment_cfg(args.experiment)
    parse_overrides(args.overrides, cfg)

    k = parse_intrinsics(args.intrinsics)
    files = list_images(args.images)
    print(f"{len(files)} images, experiment {args.experiment}")

    import cv2

    dicts = []
    for f in files:
        img = cv2.imread(f)
        if img is None:
            raise FileNotFoundError(f)
        dicts.append(
            {
                "file_name": f,
                "image_id": os.path.splitext(os.path.basename(f))[0],
                "intrinsics": k,
                "height": img.shape[0],
                "width": img.shape[1],
            }
        )

    model = build_model(cfg)
    variables = restore_variables(cfg, model, args.ckpt)
    infer_fn = get_inference_fn(model, cfg)
    mapper = DatasetMapper(build_augmentation(cfg, is_train=False), is_train=False,
                           box3d_on=bool(cfg.MODEL.BOX3D_ON))

    rng = np.random.RandomState(0)
    results = []
    vis_meta = []
    for i in range(0, len(dicts), args.batch):
        chunk = dicts[i : i + args.batch]
        samples = [mapper(d, rng) for d in chunk]
        # static batch: pad a ragged tail by repeating the last sample
        while len(samples) < args.batch and i > 0:
            samples.append(samples[-1])
        batch, meta = collate_batch(samples, max_gt=1, size_divisibility=128)
        det = infer_fn(variables, batch["image"], batch["intrinsics"])
        rows = unpack_detections({kk: np.asarray(v) for kk, v in det.items()}, batch, meta[: len(chunk)])
        for d, row in zip(chunk, rows):
            keep = np.asarray(row["scores"]) >= args.score_thresh
            rec = {
                "image_id": row["image_id"],
                "file_name": d["file_name"],
                "classes": np.asarray(row["classes"])[keep].tolist(),
                "class_names": [KITTI_CLASSES[c % len(KITTI_CLASSES)] for c in np.asarray(row["classes"])[keep]],
                "scores": np.asarray(row["scores"])[keep].round(4).tolist(),
                "scores_3d": np.asarray(row.get("scores_3d", row["scores"]))[keep].round(4).tolist(),
                "boxes2d": np.asarray(row["boxes2d"])[keep].round(2).tolist(),
            }
            if "quat" in row:
                rec["quat"] = np.asarray(row["quat"])[keep].round(5).tolist()
                rec["tvec"] = np.asarray(row["tvec"])[keep].round(3).tolist()
                rec["size"] = np.asarray(row["size"])[keep].round(3).tolist()
            results.append(rec)
            if args.vis:
                vis_meta.append((d, rec))
        print(f"  {min(i + args.batch, len(dicts))}/{len(dicts)} images done", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f)
    print(f"wrote {args.out} ({sum(len(r['scores']) for r in results)} detections)")

    if args.vis:
        from dd3d_tpu.visualizers.draw import BEVImage, draw_boxes2d, draw_boxes3d, save_vis

        os.makedirs(args.vis, exist_ok=True)
        for d, rec in vis_meta:
            img = cv2.imread(d["file_name"])
            img = draw_boxes2d(img, np.asarray(rec["boxes2d"], np.float64),
                               classes=np.asarray(rec["classes"]), scores=np.asarray(rec["scores"]),
                               class_names=KITTI_CLASSES)
            if "quat" in rec and len(rec["quat"]):
                img = draw_boxes3d(img, np.asarray(rec["quat"]), np.asarray(rec["tvec"]),
                                   np.asarray(rec["size"]), k, classes=np.asarray(rec["classes"]))
                bev = BEVImage()
                bev.render_boxes3d(np.asarray(rec["quat"]), np.asarray(rec["tvec"]),
                                   np.asarray(rec["size"]), classes=np.asarray(rec["classes"]))
                save_vis(bev.data, args.vis, f"{rec['image_id']}_bev")
            save_vis(img, args.vis, rec["image_id"])
        print(f"visualizations in {args.vis}")


if __name__ == "__main__":
    main()
