import json
import os

import numpy as np
import pytest

from dd3d_tpu.data.samplers import InferenceGroupSampler, InferenceSampler, RepeatFactorTrainingSampler, TrainingSampler
from dd3d_tpu.utils.config import CfgNode
from dd3d_tpu.utils.events import EventStorage, flatten_dict
from dd3d_tpu.utils.tasks import TaskManager


def test_training_sampler_epochs():
    s = TrainingSampler(5, seed=0)
    it = iter(s)
    first_epoch = [next(it) for _ in range(5)]
    assert sorted(first_epoch) == [0, 1, 2, 3, 4]
    second_epoch = [next(it) for _ in range(5)]
    assert sorted(second_epoch) == [0, 1, 2, 3, 4]


def test_repeat_factor_oversamples_rare():
    # class 0 in every image; class 1 in one of ten.
    dicts = [{"annotations": [{"category_id": 0}]} for _ in range(10)]
    dicts[3]["annotations"].append({"category_id": 1})
    s = RepeatFactorTrainingSampler(dicts, repeat_thresh=0.4, seed=0)
    it = iter(s)
    draw = [next(it) for _ in range(2000)]
    counts = np.bincount(draw, minlength=10)
    # the rare-class image must appear ~2x as often (sqrt(0.4/0.1) = 2)
    assert counts[3] > 1.5 * counts[:3].mean()


def test_inference_samplers_partition():
    shards = [list(InferenceSampler(10, i, 3)) for i in range(3)]
    flat = sorted(x for s in shards for x in s)
    assert flat == list(range(10))

    groups = [list(InferenceGroupSampler(12, 6, i, 2)) for i in range(2)]
    assert sorted(x for g in groups for x in g) == list(range(12))
    # groups stay intact on one shard
    for g in groups:
        for start in range(0, len(g), 6):
            chunk = g[start : start + 6]
            assert chunk == list(range(chunk[0], chunk[0] + 6))


def test_event_storage(tmp_path):
    with EventStorage(str(tmp_path)) as storage:
        storage.put_scalars(loss=1.5, acc=0.2)
        storage.step()
        storage.put_scalars(loss=1.0)
        assert storage.latest()["loss"] == 1.0
        assert len(storage.history("loss")) == 2
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 1

    assert flatten_dict({"a": {"b": 1, "c": {"d": 2}}}) == {"a/b": 1, "a/c/d": 2}


def test_task_manager():
    cfg = CfgNode.from_dict({"MODEL": {"BOX2D_ON": True, "BOX3D_ON": True, "DEPTH_ON": False}})
    tm = TaskManager(cfg)
    assert tm.box3d_on and tm.has_detection_task and not tm.has_dense_depth_task
    cfg.MODEL.BOX2D_ON = False
    with pytest.raises(ValueError):
        TaskManager(cfg)


def test_cfg_yaml_roundtrip(tmp_path):
    cfg = CfgNode.from_dict({"A": {"B": 1, "C": [1, 2]}, "D": "x"})
    p = tmp_path / "cfg.yaml"
    cfg.dump_yaml(str(p))
    loaded = CfgNode.from_yaml(str(p))
    assert loaded.to_dict() == cfg.to_dict()
    merged = loaded.merge_from_file(str(p))
    assert merged.A.B == 1


def test_comm_single_process():
    from dd3d_tpu.utils.comm import all_gather_objects, broadcast_from_master, gather_dict, get_world_size

    assert get_world_size() >= 1
    assert broadcast_from_master({"x": 1}) == {"x": 1}
    assert all_gather_objects([1, 2]) == [[1, 2]]
    assert gather_dict({"a": 1}) == {"a": 1}


def test_coco_cache_export(tmp_path):
    from dd3d_tpu.utils.coco import create_coco_format_cache

    dicts = [
        {"file_name": "x.png", "image_id": "im0", "width": 100, "height": 80,
         "annotations": [{"category_id": 0, "bbox": [10, 10, 50, 40], "bbox3d": [1] * 10}]}
    ]
    path = create_coco_format_cache(dicts, ["Car"], "fixture", str(tmp_path))
    payload = json.load(open(path))
    assert payload["annotations"][0]["bbox"] == [10.0, 10.0, 40.0, 30.0]
    assert payload["categories"][0]["name"] == "Car"
