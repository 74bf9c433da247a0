"""Gather/merge LOGIC of multi-host evaluation, on a fake comm layer.

Scope: this is a fast logic test ONLY — it shards the dataset with the real
inference samplers and monkey-patches `utils.comm` so each simulated
process's evaluator state takes part in the all-gather, asserting the merged
sharded result EQUALS the single-process result (process-count-invariant
metrics, no duplicated predictions). It does NOT exercise transport: the
real 2-process `jax.distributed` gRPC path is covered by
tests/test_two_process_distributed.py, which is the transport-level proof.

cf. reference distributed eval gather, kitti_3d_evaluator.py:152-161.
"""
import numpy as np
import pytest

import dd3d_tpu.utils.comm as comm
from dd3d_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from dd3d_tpu.data.samplers import InferenceSampler


N_IMAGES = 8


def _make_dataset(name):
    rng = np.random.RandomState(0)
    dicts = []
    for i in range(N_IMAGES):
        x0, y0 = rng.randint(0, 200, 2)
        dicts.append(
            {
                "image_id": f"img{i:02d}",
                "annotations": [
                    {
                        "category_id": 0,
                        "bbox": [float(x0), float(y0), float(x0 + 80), float(y0 + 60)],
                        "bbox3d": [1, 0, 0, 0, 0.5 * i, 1.0, 10.0 + i, 1.6, 3.9, 1.5],
                    }
                ],
            }
        )
    if name not in DatasetCatalog.list():
        DatasetCatalog.register(name, lambda: dicts)
        md = MetadataCatalog.get(name)
        md["thing_classes"] = ["Car", "Pedestrian", "Cyclist"]
    return dicts


def _detections_for(dicts):
    """Perfect detections + one lower-scored near-duplicate per image, so
    that accidental cross-process duplication WOULD change the metric."""
    dets = []
    for d in dicts:
        a = d["annotations"][0]
        box = np.asarray(a["bbox"], np.float64)
        vec = np.asarray(a["bbox3d"], np.float64)
        dets.append(
            {
                "image_id": d["image_id"],
                "classes": np.array([0, 0]),
                "scores": np.array([0.9, 0.4]),
                "scores_3d": np.array([0.85, 0.35]),
                "boxes2d": np.stack([box, box + [2, 2, 2, 2]]),
                "quat": np.stack([vec[:4], vec[:4]]),
                "tvec": np.stack([vec[4:7], vec[4:7] + 0.05]),
                "size": np.stack([vec[7:], vec[7:]]),
            }
        )
    return dets


def _simulate(evaluator_factory, dicts, dets, n_proc, monkeypatch):
    """Run per-process evaluators over disjoint shards, then evaluate on the
    simulated rank 0 with the comm layer patched to gather all shards."""
    evs = []
    for p in range(n_proc):
        sampler = InferenceSampler(len(dicts), shard_idx=p, num_shards=n_proc)
        ev = evaluator_factory()
        ev.process([dets[i] for i in sampler])
        evs.append(ev)

    if n_proc == 1:
        return evs[0].evaluate()

    # Patch the comm layer: "distributed" with a gather that returns each
    # simulated process's payload. Each evaluator calls all_gather_objects
    # exactly once from evaluate(); we capture the argument each WOULD send
    # by calling the gather lazily per evaluator.
    payloads = []

    def fake_gather(obj):
        # rank-0's own payload is `obj`; other ranks' payloads come from
        # invoking the same evaluate() path on their evaluator states. To
        # avoid recursion we collect them through a pre-pass below.
        return payloads + [obj]

    # Pre-pass: collect the other ranks' gather arguments by intercepting.
    captured = []

    def capture_gather(obj):
        captured.append(obj)
        raise _Stop()

    class _Stop(Exception):
        pass

    monkeypatch.setattr(comm, "is_distributed", lambda: True)
    monkeypatch.setattr(comm, "all_gather_objects", capture_gather)
    for ev in evs[1:]:
        with pytest.raises(_Stop):
            ev.evaluate()
    payloads[:] = captured

    monkeypatch.setattr(comm, "all_gather_objects", fake_gather)
    return evs[0].evaluate()


@pytest.mark.parametrize("n_proc", [2, 4])
def test_kitti_eval_process_count_invariant(n_proc, monkeypatch):
    from dd3d_tpu.evaluators.kitti_3d import KITTI3DEvaluator

    dicts = _make_dataset("mh_kitti_fixture")
    dets = _detections_for(dicts)

    single = _simulate(lambda: KITTI3DEvaluator("mh_kitti_fixture"), dicts, dets, 1, monkeypatch)
    sharded = _simulate(lambda: KITTI3DEvaluator("mh_kitti_fixture"), dicts, dets, n_proc, monkeypatch)

    s_flat = single["kitti_3d"]
    m_flat = sharded["kitti_3d"]
    assert set(s_flat) == set(m_flat)
    for k in s_flat:
        assert m_flat[k] == pytest.approx(s_flat[k], abs=1e-9), k


@pytest.mark.parametrize("n_proc", [2])
def test_kitti_eval_rank0_only_matches_symmetric(n_proc, monkeypatch):
    """TEST.RANK0_METRICS: rank-0-only compute + broadcast must return the
    same metrics as the default symmetric compute, and non-main ranks must
    skip the engine and return the broadcast payload."""
    from dd3d_tpu.evaluators.kitti_3d import KITTI3DEvaluator

    dicts = _make_dataset("mh_kitti_fixture")
    dets = _detections_for(dicts)

    sym = _simulate(lambda: KITTI3DEvaluator("mh_kitti_fixture"), dicts, dets, n_proc, monkeypatch)
    monkeypatch.setattr(comm, "broadcast_from_master", lambda obj: obj)
    r0 = _simulate(
        lambda: KITTI3DEvaluator("mh_kitti_fixture", rank0_only=True), dicts, dets, n_proc, monkeypatch
    )
    assert set(sym["kitti_3d"]) == set(r0["kitti_3d"])
    for k in sym["kitti_3d"]:
        assert r0["kitti_3d"][k] == pytest.approx(sym["kitti_3d"][k], abs=1e-9), k

    # Non-main rank: engine skipped, broadcast value passed through.
    sentinel = {"kitti_3d": {"from_master": 1.0}}

    def fake_bcast(obj):
        assert obj is None  # non-main sends nothing
        return sentinel

    monkeypatch.setattr(comm, "is_main_process", lambda: False)
    monkeypatch.setattr(comm, "broadcast_from_master", fake_bcast)
    out = _simulate(
        lambda: KITTI3DEvaluator("mh_kitti_fixture", rank0_only=True), dicts, dets, n_proc, monkeypatch
    )
    assert out == sentinel


def test_nuscenes_eval_rank0_only(monkeypatch, tmp_path):
    """Non-main ranks skip the nuScenes engine (and the submission write)
    and return the broadcast payload."""
    from dd3d_tpu.evaluators.nuscenes import NuscenesEvaluator

    name = "mh_nusc_r0_fixture"
    if name not in DatasetCatalog.list():
        DatasetCatalog.register(name, lambda: [])
        MetadataCatalog.get(name)["thing_classes"] = ["car"]
    ev = NuscenesEvaluator(name, output_dir=str(tmp_path / "out"), rank0_only=True)
    sentinel = {"nuscenes": {"from_master": 1.0}}
    monkeypatch.setattr(comm, "is_distributed", lambda: True)
    monkeypatch.setattr(comm, "gather_dict", lambda d: d)
    monkeypatch.setattr(comm, "is_main_process", lambda: False)
    monkeypatch.setattr(comm, "broadcast_from_master", lambda obj: sentinel)
    assert ev.evaluate() == sentinel
    assert not (tmp_path / "out").exists()  # no write off-main


@pytest.mark.parametrize("n_proc", [4])
def test_coco_eval_process_count_invariant(n_proc, monkeypatch):
    from dd3d_tpu.evaluators.coco2d import COCO2DEvaluator

    dicts = _make_dataset("mh_kitti_fixture")
    dets = _detections_for(dicts)

    single = _simulate(lambda: COCO2DEvaluator("mh_kitti_fixture"), dicts, dets, 1, monkeypatch)
    sharded = _simulate(lambda: COCO2DEvaluator("mh_kitti_fixture"), dicts, dets, n_proc, monkeypatch)

    s, m = single["bbox"], sharded["bbox"]
    for k in s:
        if isinstance(s[k], float) and np.isnan(s[k]):
            assert np.isnan(m[k]), k
        else:
            assert m[k] == pytest.approx(s[k], abs=1e-9), k


def test_nuscenes_eval_process_count_invariant(monkeypatch, tmp_path):
    from dd3d_tpu.evaluators.nuscenes import NuscenesEvaluator

    name = "mh_nusc_fixture"
    if name not in DatasetCatalog.list():
        DatasetCatalog.register(name, lambda: [])
        MetadataCatalog.get(name)["thing_classes"] = [
            "barrier", "bicycle", "bus", "car", "construction_vehicle",
            "motorcycle", "pedestrian", "traffic_cone", "trailer", "truck",
        ]

    def make_dets():
        dets = []
        for i in range(N_IMAGES):
            dets.append(
                {
                    "image_id": f"img{i}",
                    "sample_id": f"sample{i // 2}",
                    "classes": np.array([3]),
                    "scores": np.array([0.9]),
                    "scores_3d": np.array([0.8]),
                    "boxes2d": np.array([[0, 0, 10, 10.0]]),
                    "quat": np.array([[1.0, 0, 0, 0]]),
                    "tvec": np.array([[1.0, 2.0, 10.0 + i]]),
                    "size": np.array([[1.9, 4.6, 1.7]]),
                    "pose": {"wxyz": [1.0, 0, 0, 0], "tvec": [5.0, 0.0, 1.0]},
                }
            )
        return dets

    dets = make_dets()

    def factory(sub):
        return NuscenesEvaluator(name, output_dir=str(tmp_path / sub))

    single = _simulate(lambda: factory("single"), [None] * N_IMAGES, dets, 1, monkeypatch)
    assert "nuscenes" in single
    import json

    with open(tmp_path / "single" / "nusc_submission.json") as f:
        sub_single = json.load(f)

    _ = _simulate(lambda: factory("sharded"), [None] * N_IMAGES, dets, 4, monkeypatch)
    with open(tmp_path / "sharded" / "nusc_submission.json") as f:
        sub_sharded = json.load(f)

    assert sub_single["results"].keys() == sub_sharded["results"].keys()
    for k in sub_single["results"]:
        assert len(sub_single["results"][k]) == len(sub_sharded["results"][k])
        t_single = sorted(tuple(d["translation"]) for d in sub_single["results"][k])
        t_sharded = sorted(tuple(d["translation"]) for d in sub_sharded["results"][k])
        assert t_single == t_sharded
