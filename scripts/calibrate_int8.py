#!/usr/bin/env python
"""Calibrate static int8 activation scales (PTQ) from representative images.

Dynamic PTQ (TPU.QUANT_INT8) computes one activation abs-max per quantized
conv per batch — an extra full activation pass each. This CLI records those
observed abs-maxes over a calibration set and writes them to JSON; inference
run with TPU.QUANT_SCALES_PATH=<json> bakes each scale in as a trace-time
constant and the dynamic reduce passes disappear from the program (the
residual dynamic-quant overhead named in BASELINE.md).

    python scripts/calibrate_int8.py --experiment dd3d_kitti_dla34 \
        --ckpt model_final.pth --images /data/frames \
        --intrinsics 721.5,721.5,609.5,172.8 --out scales.json [--batch 8]

Capture mechanism: every norm-folded conv sows its input abs-max into the
`intermediates` collection (models/layers.py FoldableConv — a no-op in
normal inference), so calibration is plain batched inference applied with
mutable=["intermediates"] plus a running max across batches. Scales are
recorded for EVERY folded conv, so one calibration serves any
TPU.QUANT_MIN_CH gate. Margin: --headroom (default 1.0) multiplies the
recorded maxes; >1 trades clipping risk for quantization step size.

cf. the inference path this accelerates,
tridet/modeling/dd3d/fcos2d.py:242-367; the reference has no quantized path.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


# Library implementation lives in the package (usable from bench.py,
# __graft_entry__.dryrun_multichip, tests); this CLI re-exports it.
from dd3d_tpu.models.calibrate import capture_scales, prepare_static_scales  # noqa: F401,E402


def main():
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--experiment", required=True)
    ap.add_argument("--images", required=True, help="directory or glob of calibration images")
    ap.add_argument("--intrinsics", required=True, help='"fx,fy,cx,cy" or JSON file')
    ap.add_argument("--ckpt", default=None, help=".pth (reference) or orbax dir")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-images", type=int, default=64)
    ap.add_argument("--headroom", type=float, default=1.0, help="scale multiplier on recorded maxes")
    ap.add_argument("--out", default="int8_scales.json")
    ap.add_argument("overrides", nargs="*", help="KEY=VALUE config overrides")
    args = ap.parse_args()

    from predict import list_images, parse_intrinsics, restore_variables
    from train import parse_overrides

    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.data.augmentations import build_augmentation
    from dd3d_tpu.data.mapper import DatasetMapper, collate_batch
    from dd3d_tpu.models import build_model

    cfg = get_experiment_cfg(args.experiment)
    parse_overrides(args.overrides, cfg)

    k = parse_intrinsics(args.intrinsics)
    files = list_images(args.images)[: args.max_images]
    print(f"{len(files)} calibration images, experiment {args.experiment}")

    import cv2

    model = build_model(cfg)
    variables = restore_variables(cfg, model, args.ckpt)
    mapper = DatasetMapper(build_augmentation(cfg, is_train=False), is_train=False,
                           box3d_on=bool(cfg.MODEL.BOX3D_ON))
    rng = np.random.RandomState(0)

    def batches():
        for i in range(0, len(files), args.batch):
            chunk = files[i : i + args.batch]
            samples = []
            for f in chunk:
                img = cv2.imread(f)
                if img is None:
                    raise FileNotFoundError(f)
                samples.append(mapper({
                    "file_name": f, "image_id": os.path.basename(f),
                    "intrinsics": k, "height": img.shape[0], "width": img.shape[1],
                }, rng))
            while len(samples) < args.batch and i > 0:  # keep one static canvas
                samples.append(samples[-1])
            batch, _ = collate_batch(samples, max_gt=1, size_divisibility=128)
            yield batch["image"]

    scales = capture_scales(cfg, model, variables, batches())
    if args.headroom != 1.0:
        scales = {kk: {t: a * args.headroom for t, a in v.items()} for kk, v in scales.items()}
    with open(args.out, "w") as f:
        json.dump(scales, f, indent=0, sort_keys=True)
    print(f"wrote {args.out}; use with TPU.QUANT_INT8=True TPU.QUANT_SCALES_PATH={args.out}")


if __name__ == "__main__":
    main()
