"""nuScenes TRAINING through the real CLI on an annotated 6-camera fixture.

Complements test_nusc_e2e.py (eval-only): drives
`scripts/train.py +experiments=dd3d_nusc_dla34` for two optimizer steps and
asserts the NuscenesDD3D loss path is live end-to-end — loss_attr and
loss_speed present and finite (the reference trains them inside
NuscenesLoss, tridet/modeling/dd3d/nuscenes_dd3d.py:199-265; a mis-wired
train step would silently fall back to plain DD3D losses, VERDICT r1 #3).
"""
import json
import os
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CLASS_NAMES = [
    "barrier", "bicycle", "bus", "car", "construction_vehicle",
    "motorcycle", "pedestrian", "traffic_cone", "trailer", "truck",
]


@pytest.fixture(scope="module")
def nusc_train_fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc_train_fixture")
    ds_dir = root / "json_datasets"
    ds_dir.mkdir()

    h, w = 128, 192
    rng = np.random.RandomState(1)
    image = (rng.rand(h, w, 3) * 40 + 80).astype(np.uint8)
    image[30:95, 60:140] = 220
    cv2.imwrite(str(ds_dir / "cam.png"), image)

    k = [[150.0, 0.0, 96.0], [0.0, 150.0, 64.0], [0.0, 0.0, 1.0]]
    # one upright car 18 m ahead: quat x(+90deg), attributes/speeds set so
    # both nuScenes losses see valid targets
    s = float(np.sqrt(0.5))
    bbox3d = [s, s, 0.0, 0.0, 0.2, 0.3, 18.0, 1.9, 4.6, 1.7]
    anno = {
        "category_id": 3, "instance_id": "i0",
        "bbox": [70.0, 35.0, 130.0, 90.0],
        "bbox3d": bbox3d, "attribute_id": 0, "speed": 3.5,
    }
    dicts = []
    for cam in range(6):
        dicts.append({
            "file_name": "cam.png", "image_id": f"img_{cam}",
            "sample_id": "sample0", "width": w, "height": h,
            "intrinsics": k,
            "pose": {"wxyz": [1.0, 0.0, 0.0, 0.0], "tvec": [10.0, -2.0, 1.5]},
            "extrinsics": {"wxyz": [1.0, 0.0, 0.0, 0.0], "tvec": [0.0, 0.0, 0.0]},
            "annotations": [anno],
        })
    manifest = {
        "name": "nusc_train_fixture",
        "metadata": {
            "thing_classes": CLASS_NAMES,
            "id_to_name": {i: n for i, n in enumerate(CLASS_NAMES)},
            "evaluators": ["nuscenes_evaluator"],
        },
        "dicts": dicts,
    }
    with open(ds_dir / "nusc_train_fixture.json", "w") as f:
        json.dump(manifest, f)
    return str(root)


@pytest.mark.slow
def test_nusc_train_cli_losses_live(nusc_train_fixture_root, tmp_path):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        PYTHONPATH=REPO,
    )
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "train.py"),
        "+experiments=dd3d_nusc_dla34",
        f"DATASET_ROOT={nusc_train_fixture_root}",
        "DATASETS.TRAIN.NAME=nusc_train_fixture",
        "DATASETS.TEST.NAME=nusc_train_fixture",
        "SOLVER.MAX_ITER=2",
        "SOLVER.IMS_PER_BATCH=2",
        "SOLVER.CHECKPOINT_PERIOD=1000",
        "TEST.EVAL_PERIOD=0",
        "TEST.AUG.ENABLED=False",
        "INPUT.RESIZE.MIN_SIZE_TRAIN=[128]",
        "DATALOADER.TRAIN.NUM_WORKERS=2",
        f"OUTPUT_ROOT={tmp_path}",
    ]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=1500)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, f"STDOUT:\n{proc.stdout[-3000:]}\nSTDERR:\n{proc.stderr[-5000:]}"
    assert "loss_attr" in out, "nuScenes attribute loss not wired into the CLI train step"
    assert "loss_speed" in out, "nuScenes speed loss not wired into the CLI train step"
    # the logged metrics line carries loss_finite=1.0000 when all losses are finite
    assert "loss_finite=1.0000" in out
