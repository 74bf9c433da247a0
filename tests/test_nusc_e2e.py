"""End-to-end nuScenes-style 6-camera evaluation through the real CLI.

VERDICT round-1 "done" criterion for wiring nuScenes: drive
`scripts/train.py +experiments=dd3d_nusc_dla34 EVAL_ONLY=True` on a synthetic
6-camera fixture (JSON-manifest dataset) and assert
  (a) the submission JSON carries non-identity global translations (camera
      poses are composed into world frame, cf. reference
      nuscenes_evaluator.py:230-247), and
  (b) sample-level aggregation (global BEV NMS across the 6 cameras,
      nuscenes_dd3d.py:448-465) yields strictly fewer detections than the
      unaggregated run — the fixture repeats the SAME image in all 6 cameras
      with the SAME pose, so every detection appears 6x in the global frame
      and must be suppressed down to ~1x.
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

# All six cameras share one non-identity pose: rotation = identity,
# translation = (10, -2, 1.5). Global translations must differ from
# camera-frame ones by exactly this offset.
POSE_TVEC = [10.0, -2.0, 1.5]


@pytest.fixture(scope="module")
def nusc_fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("nusc_fixture")
    ds_dir = root / "json_datasets"
    ds_dir.mkdir()

    h, w = 128, 192
    rng = np.random.RandomState(0)
    image = (rng.rand(h, w, 3) * 40 + 80).astype(np.uint8)
    image[30:95, 60:140] = 220
    image[40:85, 70:130, 0] = 40
    cv2.imwrite(str(ds_dir / "cam.png"), image)

    k = [[150.0, 0.0, 96.0], [0.0, 150.0, 64.0], [0.0, 0.0, 1.0]]
    dicts = []
    for cam in range(6):
        dicts.append(
            {
                "file_name": "cam.png",
                "image_id": f"img_{cam}",
                "sample_id": "sample0",
                "width": w,
                "height": h,
                "intrinsics": k,
                "pose": {"wxyz": [1.0, 0.0, 0.0, 0.0], "tvec": POSE_TVEC},
                "extrinsics": {"wxyz": [1.0, 0.0, 0.0, 0.0], "tvec": [0.0, 0.0, 0.0]},
                "annotations": [],
            }
        )
    manifest = {
        "name": "nusc_fixture",
        "metadata": {
            "thing_classes": CLASS_NAMES,
            "id_to_name": {i: n for i, n in enumerate(CLASS_NAMES)},
            "evaluators": ["nuscenes_evaluator"],
        },
        "dicts": dicts,
    }
    with open(ds_dir / "nusc_fixture.json", "w") as f:
        json.dump(manifest, f)
    return str(root)


def _run_eval(nusc_fixture_root, out_dir, aggregate: bool):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        PYTHONPATH=REPO,
    )
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "train.py"),
        "+experiments=dd3d_nusc_dla34",
        "EVAL_ONLY=True",
        f"DATASET_ROOT={nusc_fixture_root}",
        "DATASETS.TEST.NAME=nusc_fixture",
        "TEST.IMS_PER_BATCH=6",
        "TEST.AUG.ENABLED=False",
        "INPUT.RESIZE.MIN_SIZE_TEST=128",
        # untrained model: drop the score floor so candidates always exist
        "DD3D.FCOS2D.INFERENCE.PRE_NMS_THRESH=-1.0",
        "DD3D.FCOS2D.INFERENCE.POST_NMS_TOPK=32",
        "TPU.PRE_NMS_CANDIDATES_PER_LEVEL=32",
        f"DD3D.INFERENCE.NUSC_SAMPLE_AGGREGATE={aggregate}",
        "DATALOADER.TEST.NUM_WORKERS=2",
        f"OUTPUT_ROOT={out_dir}",
    ]
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, f"STDOUT:\n{proc.stdout[-3000:]}\nSTDERR:\n{proc.stderr[-5000:]}"
    subs = []
    for dirpath, _dirnames, filenames in os.walk(out_dir):
        if "nusc_submission.json" in filenames:
            subs.append(os.path.join(dirpath, "nusc_submission.json"))
    assert subs, f"no submission written under {out_dir}"
    with open(sorted(subs)[-1]) as f:
        return json.load(f)


@pytest.mark.slow
def test_nusc_eval_cli_sample_aggregation(nusc_fixture_root, tmp_path):
    sub_agg = _run_eval(nusc_fixture_root, str(tmp_path / "agg"), aggregate=True)
    sub_raw = _run_eval(nusc_fixture_root, str(tmp_path / "raw"), aggregate=False)

    dets_agg = sub_agg["results"]["sample0"]
    dets_raw = sub_raw["results"]["sample0"]
    assert len(dets_raw) > 0, "untrained model produced no detections at thresh 0"

    # (b) cross-camera suppression: 6 identical cameras -> ~6x duplicate
    # suppression. Require a strict reduction.
    assert len(dets_agg) < len(dets_raw), (len(dets_agg), len(dets_raw))

    # (a) global translations are camera translations + the (non-identity)
    # camera->world pose; with identity rotation the offset is exactly
    # POSE_TVEC, so no translation may equal its camera-frame value.
    for det in dets_agg[:20]:
        t = np.asarray(det["translation"])
        assert not np.allclose(t - np.asarray(POSE_TVEC), t, atol=1e-6)
        # depth axis (camera z) maps to world z + 1.5; crude sanity: the
        # pose offset must appear in the translation.
    offs = np.asarray([d["translation"] for d in dets_agg]) - np.asarray(POSE_TVEC)
    # camera-frame depths are positive and bounded; after removing the pose
    # offset the remaining vector must equal a camera-frame tvec (z > 0).
    assert (offs[:, 2] > 0).all()
