"""Multi-chip eval sharding: inference_on_dataset over the 8-device CPU mesh
must produce detections identical to the unsharded (jit=False) path.

On a multi-chip host the eval batch is sharded over local devices like the
train step's data axis (models/postprocess.py); ragged tail batches are
padded to a device-count multiple and the padded rows dropped at unpack.
The fixture batch size (2) deliberately does NOT divide the 8 virtual
devices, exercising the padding path on every batch.
"""
import os

import numpy as np
import jax
import pytest

from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.data.build import build_test_dataloader
from dd3d_tpu.data.catalog import register_datasets
from dd3d_tpu.models import build_model
from dd3d_tpu.models.postprocess import inference_on_dataset

from tests.test_kitti_data import kitti_root  # fixture  # noqa: F401


class _CaptureEvaluator:
    def reset(self):
        self.dets = []

    def process(self, per_image):
        self.dets.extend(per_image)

    def evaluate(self):
        return {}


def test_sharded_eval_matches_unsharded(kitti_root):  # noqa: F811
    assert jax.local_device_count() == 8, "conftest should provide the 8-device CPU mesh"
    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    cfg.DATASET_ROOT = os.path.dirname(kitti_root)
    cfg.TEST.IMS_PER_BATCH = 2
    cfg.INPUT.RESIZE.MIN_SIZE_TEST = 128
    cfg.TPU.COMPUTE_DTYPE = "float32"  # exact agreement between the two paths
    # untrained model: remove the score floor so candidates exist
    cfg.DD3D.FCOS2D.INFERENCE.PRE_NMS_THRESH = -1.0
    cfg.DD3D.FCOS2D.INFERENCE.POST_NMS_TOPK = 16
    cfg.TPU.PRE_NMS_CANDIDATES_PER_LEVEL = 16
    register_datasets(cfg)

    model = build_model(cfg)
    loader = build_test_dataloader(cfg, dataset_name="kitti_3d_train")
    batch, _ = next(iter(loader))
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), np.asarray(batch["image"][:1], np.float32)
    )

    outs = {}
    for jit in (True, False):
        ev = _CaptureEvaluator()
        loader = build_test_dataloader(cfg, dataset_name="kitti_3d_train")
        inference_on_dataset(model, cfg, variables, loader, [ev], jit=jit)
        outs[jit] = ev.dets

    assert len(outs[True]) == len(outs[False]) > 0
    for a, b in zip(outs[True], outs[False]):
        assert a["image_id"] == b["image_id"]
        assert len(a["classes"]) == len(b["classes"])
        np.testing.assert_array_equal(a["classes"], b["classes"])
        np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(a["boxes2d"], b["boxes2d"], rtol=1e-4, atol=1e-3)
        if "tvec" in a:
            np.testing.assert_allclose(a["tvec"], b["tvec"], rtol=1e-4, atol=1e-3)
