"""Serving CLI smoke: scripts/predict.py on raw images (no dataset, no GT).

Runs the real CLI as a subprocess (shrunk model) over synthetic PNGs and
checks the JSON payload shape and visualization outputs.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_predict_cli(tmp_path):
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        cv2.imwrite(str(img_dir / f"frame{i:03d}.png"), (rng.rand(96, 320, 3) * 255).astype(np.uint8))

    out_json = tmp_path / "preds.json"
    vis_dir = tmp_path / "vis"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ""  # axon-free import (hook blocks when tunnel is down)
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "predict.py"),
        "--experiment", "dd3d_kitti_dla34",
        "--images", str(img_dir),
        "--intrinsics", "700,700,160,48",
        "--batch", "2",
        "--out", str(out_json),
        "--vis", str(vis_dir),
        # shrunk model: the test is about the CLI path, not capacity
        "FE.BACKBONE.NAME=DLA-46-C", "FE.BUILDER=build_fcos_dla_fpn_backbone_p6",
        "FE.OUT_FEATURES=['p3','p4','p5','p6']", "FE.FPN.OUT_CHANNELS=64",
        "DD3D.FCOS2D.NUM_CLS_CONVS=1", "DD3D.FCOS2D.NUM_BOX_CONVS=1",
        "DD3D.FCOS3D.NUM_CONVS=1", "INPUT.RESIZE.MIN_SIZE_TEST=96",
    ]
    res = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, timeout=540, text=True)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]

    rows = json.load(open(out_json))
    assert len(rows) == 3
    for r in rows:
        for k in ("image_id", "classes", "scores", "scores_3d", "boxes2d", "quat", "tvec", "size"):
            assert k in r, k
        n = len(r["scores"])
        assert len(r["boxes2d"]) == n and len(r["tvec"]) == n
        # boxes in ORIGINAL image coordinates
        for b in r["boxes2d"]:
            assert 0 <= b[0] <= 320 and 0 <= b[1] <= 96
    # one wireframe + one BEV png per image
    names = sorted(os.listdir(vis_dir))
    assert len([n for n in names if n.endswith("_bev.png")]) == 3
    assert len(names) == 6
