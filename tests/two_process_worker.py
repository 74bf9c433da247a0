"""Worker + shared fixtures for the REAL 2-process `jax.distributed`
integration test (VERDICT round-2 item 3).

Run as a subprocess: `python tests/two_process_worker.py <pid> <nprocs> <port> <out.json>`
with JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=4 in the
environment. Exercises the genuine multi-process transports:
- `jax.make_array_from_process_local_data` (train batch assembly),
- in-graph global-sum collectives across the 2-process / 8-device mesh,
- `all_gather_objects` (evaluator gather),
- `broadcast_from_master` (object bcast).
cf. the reference's mpirun launch + NCCL/MPI stack (Makefile:34-49,
utils/setup.py:23-60).

The same `run_workload` is imported by the parent pytest to compute the
single-process reference result.
"""
import json
import os
import sys

import numpy as np


def tiny_cfg():
    from dd3d_tpu.configs import get_experiment_cfg

    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    cfg.FE.BACKBONE.NAME = "DLA-46-C"
    cfg.FE.BUILDER = "build_fcos_dla_fpn_backbone_p6"
    cfg.FE.OUT_FEATURES = ["p3", "p4", "p5", "p6"]
    cfg.FE.FPN.OUT_CHANNELS = 64
    cfg.DD3D.FCOS2D.NUM_CLS_CONVS = 1
    cfg.DD3D.FCOS2D.NUM_BOX_CONVS = 1
    cfg.DD3D.FCOS3D.NUM_CONVS = 1
    # fp32 forward: the test compares 2-process vs 1-process losses, and a
    # bf16 forward makes reduction-order noise (~1e-3 rel, compounding
    # through the SGD update into step 1) indistinguishable from small
    # transport bugs. In fp32 the two runs agree to ~1e-5.
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def global_batch(step, b=8, g=4, hw=64):
    """Deterministic GLOBAL batch; every process derives its local slice."""
    rng = np.random.RandomState(1000 + step)
    k = np.array([[700.0, 0, 32], [0, 700.0, 32], [0, 0, 1]], np.float32)
    return {
        "image": rng.rand(b, hw, hw, 3).astype(np.float32) * 255,
        "intrinsics": np.tile(k, (b, 1, 1)),
        "gt_boxes2d": np.tile(np.array([10, 10, 50, 45], np.float32), (b, g, 1)),
        "gt_classes": np.zeros((b, g), np.int32),
        "gt_boxes3d": np.tile(
            np.array([1, 0, 0, 0, 30, 28, 20, 1.6, 3.9, 1.5], np.float32), (b, g, 1)
        ),
        "gt_valid": np.tile(np.arange(g)[None] < 2, (b, 1)),
    }


N_EVAL_IMAGES = 8


def eval_fixture(dataset_name):
    """Fixture dataset + perfect-ish detections (with lower-scored
    near-duplicates so cross-process duplication would move the metric)."""
    from dd3d_tpu.data.catalog import DatasetCatalog, MetadataCatalog

    rng = np.random.RandomState(0)
    dicts = []
    for i in range(N_EVAL_IMAGES):
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
    if dataset_name not in DatasetCatalog.list():
        DatasetCatalog.register(dataset_name, lambda: dicts)
        MetadataCatalog.get(dataset_name)["thing_classes"] = ["Car", "Pedestrian", "Cyclist"]

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
    return dicts, dets


def run_workload(dataset_name="two_proc_fixture"):
    """2 train steps + sharded eval + object bcast; identical global inputs
    regardless of process count. Returns a JSON-serializable result dict."""
    import jax

    from dd3d_tpu.data.samplers import InferenceSampler
    from dd3d_tpu.evaluators.kitti_3d import KITTI3DEvaluator
    from dd3d_tpu.models import build_model
    from dd3d_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
    from dd3d_tpu.training.train_loop import create_train_state
    from dd3d_tpu.training.train_step import make_train_step
    from dd3d_tpu.utils import comm

    rank, world = comm.get_rank(), comm.get_world_size()

    cfg = tiny_cfg()
    model = build_model(cfg)
    mesh = make_mesh()  # all GLOBAL devices
    repl, bsh = replicated(mesh), batch_sharding(mesh)

    state = create_train_state(cfg, model, global_batch(0))
    state = jax.device_put(state, repl)
    step_fn = jax.jit(
        make_train_step(cfg, model),
        donate_argnums=(0,),
        in_shardings=(repl, bsh),
        out_shardings=(repl, repl),
    )

    def make_batch(step):
        gb = global_batch(step)
        b = gb["image"].shape[0]
        lo, hi = rank * b // world, (rank + 1) * b // world
        local = {k: v[lo:hi] for k, v in gb.items()}
        if world > 1:
            return {
                k: jax.make_array_from_process_local_data(bsh, np.asarray(v))
                for k, v in local.items()
            }
        return jax.device_put(local, bsh)

    batch0 = make_batch(0)
    # AOT-compile BEFORE the first execution, then line the ranks up at a
    # COORDINATION-SERVICE barrier (gRPC, long timeout). On a 1-core box the
    # two ranks' multi-minute CPU compiles serialize, so without this the
    # first device collective's Gloo rendezvous (hard 30 s KV timeout) sees
    # the ranks arrive minutes apart and kills the job.
    compiled_step = step_fn.lower(state, batch0).compile()
    if world > 1:
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier("dd3d_compiled", 900_000)

    losses = []
    for step in range(2):
        batch = batch0 if step == 0 else make_batch(step)
        state, metrics = compiled_step(state, batch)
        m = jax.device_get(metrics)
        losses.append({k: float(v) for k, v in m.items() if k.startswith("loss") or k == "total_loss"})

    # sharded eval through the REAL all_gather_objects transport
    dicts, dets = eval_fixture(dataset_name)
    sampler = InferenceSampler(len(dicts), shard_idx=rank, num_shards=world)
    ev = KITTI3DEvaluator(dataset_name, iou_thresholds=[0.5])
    ev.process([dets[i] for i in sampler])
    results = ev.evaluate()["kitti_3d"]

    # TEST.RANK0_METRICS shape over the same real transport (VERDICT r4 #5):
    # rank 0 runs the AP engine once, rank 1 must get identical metrics from
    # the broadcast WITHOUT running the engine (counted via a wrapper).
    ev0 = KITTI3DEvaluator(dataset_name, iou_thresholds=[0.5], rank0_only=True)
    ev0.process([dets[i] for i in sampler])
    engine_calls = {"n": 0}
    inner = ev0._compute_metrics

    def counted(*a, **kw):
        engine_calls["n"] += 1
        return inner(*a, **kw)

    ev0._compute_metrics = counted
    results_rank0 = ev0.evaluate()["kitti_3d"]

    # object broadcast (non-array payload: exercises the pickle path)
    payload = {"token": "from-rank-0", "values": [1, 2, 3]} if rank == 0 else None
    bcast = comm.broadcast_from_master(payload)

    return {
        "rank": rank,
        "world": world,
        "n_global_devices": jax.device_count(),
        "losses": losses,
        "eval": {k: float(v) for k, v in results.items()},
        "eval_rank0": {k: float(v) for k, v in results_rank0.items()},
        "rank0_engine_calls": engine_calls["n"],
        "bcast": bcast,
    }


def main():
    pid, nprocs, port, out_path = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # The env var alone is NOT enough: the axon TPU plugin prepends itself
    # to the platform list and silently wins (the run then sees ONE TPU
    # device and world=1). Force cpu at the config level like conftest.
    jax.config.update("jax_platforms", "cpu")
    # share the test suite's persistent compile cache: cold CPU compiles of
    # the train step skew the two ranks minutes apart otherwise
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from dd3d_tpu.utils.comm import init_distributed

    init_distributed(f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, (
        f"expected {nprocs} processes, got {jax.process_count()} on platform "
        f"{jax.devices()[0].platform}"
    )
    result = run_workload()
    with open(out_path, "w") as f:
        json.dump(result, f)
    # line both ranks up before the jax.distributed shutdown barrier: a slow
    # box can otherwise skew the ranks past the barrier timeout
    from dd3d_tpu.utils.comm import all_gather_objects

    all_gather_objects("done")
    print(f"rank {pid} done", flush=True)


if __name__ == "__main__":
    main()
