#!/usr/bin/env python
"""Train/eval driver — rebuild of the reference `scripts/train.py`.

Usage:
    python scripts/train.py +experiments=dd3d_kitti_dla34 [KEY=VALUE ...]
    python scripts/train.py --experiment dd3d_kitti_dla34 EVAL_ONLY=True

Mirrors the reference flow (scripts/train.py:40-78): compose config
(experiment delta + dotted-key CLI overrides), register datasets, build
model, optionally restore a checkpoint, run the train loop (do_train,
:81-194) with periodic eval, then final test (do_test, :197-274).
The distributed runtime is jax.distributed + mesh sharding instead of
mpirun/NCCL/DDP (SURVEY.md §5.8).
"""
import argparse
import ast
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = logging.getLogger("dd3d_tpu.train")


def parse_overrides(pairs, cfg):
    for pair in pairs:
        if pair.startswith("+experiments="):
            continue
        if "=" not in pair:
            raise ValueError(f"Override must be KEY=VALUE: {pair!r}")
        key, val = pair.split("=", 1)
        try:
            val = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            pass
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = val
    return cfg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment", default=None)
    parser.add_argument("overrides", nargs="*", help="KEY=VALUE config overrides or +experiments=NAME")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s: %(message)s")

    experiment = args.experiment
    for o in args.overrides:
        if o.startswith("+experiments="):
            experiment = o.split("=", 1)[1]

    from dd3d_tpu.configs import get_cfg, get_experiment_cfg

    cfg = get_experiment_cfg(experiment) if experiment else get_cfg()
    cfg = parse_overrides(args.overrides, cfg)

    import jax

    # Honor an explicit JAX_PLATFORMS=cpu request: some TPU plugins prepend
    # themselves to the platform list regardless of the env var.
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from dd3d_tpu.data import register_datasets
    from dd3d_tpu.models import build_model
    from dd3d_tpu.utils.comm import init_distributed

    # Multi-host: one env-driven call replaces mpirun + NCCL + MPI
    # (SetupDistributedCallback, tridet/utils/hydra/callbacks.py:17-30).
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        init_distributed(
            os.environ["JAX_COORDINATOR_ADDRESS"],
            int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            int(os.environ.get("JAX_PROCESS_ID", "0")),
        )

    LOG.info("Devices: %s (process %d/%d)", jax.devices(), jax.process_index(), jax.process_count())
    if cfg.SOLVER.get("SYNCBN_USE_LOCAL_WORKERS", False):
        # Reference option (configs/common/optimizer.yaml:66-68): restrict
        # SyncBN stat sync to machine-local process groups, a workaround for
        # slow inter-node links. On a TPU mesh the BN-stat psum rides ICI and
        # is negligible next to the gradient all-reduce, so stats stay
        # globally synchronized; the flag is accepted for config parity.
        LOG.warning("SOLVER.SYNCBN_USE_LOCAL_WORKERS requested: BN statistics "
                    "sync globally over ICI on TPU (same training semantics, "
                    "no local-group restriction).")
    register_datasets(cfg)

    output_dir = os.path.join(cfg.OUTPUT_ROOT, experiment or "default", time.strftime("%Y%m%d_%H%M%S"))
    os.makedirs(output_dir, exist_ok=True)
    LOG.info("Output dir: %s", output_dir)

    model = build_model(cfg)

    if cfg.EVAL_ONLY:
        do_test(cfg, model, output_dir, ckpt_path=cfg.MODEL.CKPT or None)
        if cfg.TEST.AUG.ENABLED:
            do_test(cfg, model, output_dir, ckpt_path=cfg.MODEL.CKPT or None, use_tta=True)
        return

    do_train(cfg, model, output_dir)
    ckpt = os.path.join(output_dir, "ckpt")
    do_test(cfg, model, output_dir, ckpt_path=ckpt)
    # Final test with TTA, like the reference (scripts/train.py:75-77).
    if cfg.TEST.AUG.ENABLED:
        do_test(cfg, model, output_dir, ckpt_path=ckpt, use_tta=True)


def do_train(cfg, model, output_dir):
    from dd3d_tpu.data.build import build_train_dataloader
    from dd3d_tpu.training.train_loop import train

    loader = build_train_dataloader(cfg)

    def data_iter():
        for batch, _meta in loader:
            yield batch

    def eval_hook(step, state):
        LOG.info("Periodic eval at step %d", step)
        try:
            do_test(cfg, model, output_dir, state=state)
        except Exception:
            LOG.exception("Periodic eval failed")

    state = train(
        cfg,
        data_iter(),
        model=model,
        output_dir=output_dir,
        eval_hook=eval_hook if cfg.TEST.EVAL_PERIOD > 0 else None,
    )
    return state


def do_test(cfg, model, output_dir, state=None, ckpt_path=None, use_tta=False):
    import jax

    from dd3d_tpu.data.build import build_test_dataloader
    from dd3d_tpu.evaluators import get_evaluator
    from dd3d_tpu.models.postprocess import inference_on_dataset

    if state is not None:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    else:
        import numpy as np
        import jax.numpy as jnp

        variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
        )
        if ckpt_path and (ckpt_path.endswith((".pth", ".pt")) or ckpt_path.startswith(("http", "s3://", "gs://"))):
            # Reference PyTorch checkpoint: resolve remote path, convert.
            from dd3d_tpu.utils.convert_checkpoint import convert_torch_state_dict
            from dd3d_tpu.utils.s3 import maybe_download_ckpt

            local = maybe_download_ckpt(ckpt_path)
            import torch

            sd = torch.load(local, map_location="cpu")
            sd = sd.get("model", sd) if isinstance(sd, dict) else sd
            sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
            params, batch_stats = convert_torch_state_dict(sd, variables)
            variables = {"params": params, "batch_stats": batch_stats}
        elif ckpt_path and os.path.isdir(ckpt_path):
            from dd3d_tpu.training.checkpoint import CheckpointManager
            from dd3d_tpu.training.optim import build_optimizer
            from dd3d_tpu.training.train_step import TrainState

            tx = build_optimizer(cfg, variables["params"])
            st = TrainState.create(variables["params"], variables.get("batch_stats", {}), tx)
            st = CheckpointManager(ckpt_path).restore(st)
            variables = {"params": st.params, "batch_stats": st.batch_stats}

    dataset_name = cfg.DATASETS.TEST.NAME
    group_size = 6 if cfg.MODEL.META_ARCHITECTURE == "NuscenesDD3D" else 1

    if use_tta:
        # TTA path: per-image multi-scale + flip inference (models/tta.py),
        # mirroring do_test(use_tta=True) (reference train.py:204-210).
        return _do_test_tta(cfg, model, variables, dataset_name, output_dir)

    loader = build_test_dataloader(
        cfg, dataset_name=dataset_name, group_size=group_size,
        shard_idx=jax.process_index(), num_shards=jax.process_count(),
    )
    evaluators = get_evaluator(cfg, dataset_name, output_dir=output_dir)
    vis_dir = os.path.join(output_dir, "visualization") if output_dir else None
    results = inference_on_dataset(model, cfg, variables, loader, evaluators,
                                   visualize_dir=vis_dir, group_size=group_size)

    _log_results(results)
    return results


def _log_results(results):
    flat = {}
    def _flatten(d, prefix=""):
        for k, v in d.items():
            if isinstance(v, dict):
                _flatten(v, f"{prefix}{k}/")
            else:
                flat[f"{prefix}{k}"] = v
    _flatten(results)
    for k in sorted(flat):
        LOG.info("%s = %.4f", k, flat[k])


def _do_test_tta(cfg, model, variables, dataset_name, output_dir):
    import jax
    import numpy as np

    from dd3d_tpu.data.catalog import DatasetCatalog
    from dd3d_tpu.data.mapper import read_image_bgr
    from dd3d_tpu.data.samplers import InferenceGroupSampler, InferenceSampler
    from dd3d_tpu.evaluators import get_evaluator
    from dd3d_tpu.models.tta import DD3DWithTTA

    from dd3d_tpu.models.tta import NuscenesDD3DWithTTA

    nuscenes = cfg.MODEL.META_ARCHITECTURE == "NuscenesDD3D"
    tta = (NuscenesDD3DWithTTA if nuscenes else DD3DWithTTA)(cfg, model, variables)
    evaluators = get_evaluator(cfg, dataset_name, output_dir=output_dir)
    for ev in evaluators:
        ev.reset()
    dicts = DatasetCatalog.get(dataset_name)
    # Shard across processes like the non-TTA path; without this every
    # process would evaluate the FULL dataset and the evaluator all-gather
    # would count each prediction process_count times (duplicate detections
    # become false positives after first match).
    group_size = 6 if nuscenes else 1
    if group_size > 1:
        sampler = InferenceGroupSampler(len(dicts), group_size, jax.process_index(), jax.process_count())
    else:
        sampler = InferenceSampler(len(dicts), jax.process_index(), jax.process_count())
    dicts = [dicts[i] for i in sampler]

    def run_chunk(chunk):
        """Batched TTA: one device call per (variant, size) bucket across the
        whole chunk (models/tta.py infer_batch)."""
        # keep uint8: the uint8 resize path uses PIL BILINEAR like the reference
        images = [read_image_bgr(d["file_name"]) for d in chunk]
        ks = [np.asarray(d["intrinsics"], np.float64).reshape(3, 3) for d in chunk]
        outs = tta.infer_batch(images, ks)
        dets = []
        for d, out in zip(chunk, outs):
            det = {"image_id": d["image_id"], "sample_id": d.get("sample_id"), **out}
            if d.get("pose") is not None:
                det["pose"] = d["pose"]
            dets.append(det)
        return dets

    chunk_size = max(group_size, int(cfg.TEST.IMS_PER_BATCH) // max(1, jax.process_count()))
    chunk_size = max(group_size, (chunk_size // group_size) * group_size)
    if nuscenes:
        # Post-hoc 6-camera sample aggregation (nuscenes_dd3d_tta.py:57-73).
        from dd3d_tpu.models.cross_camera import get_group_idxs
        from dd3d_tpu.structures.pose import Pose

        for c in range(0, len(dicts), chunk_size):
            chunk = dicts[c : c + chunk_size]
            chunk_dets = run_chunk(chunk)
            for g in range(0, len(chunk), group_size):
                group = chunk[g : g + group_size]
                dets = chunk_dets[g : g + group_size]
                if cfg.DD3D.INFERENCE.get("NUSC_SAMPLE_AGGREGATE", False):
                    group_idxs = get_group_idxs([d.get("sample_id") or "s" for d in dets], group_size)
                    poses = [
                        Pose(wxyz=d["pose"]["wxyz"], tvec=d["pose"]["tvec"]) if d.get("pose") else Pose()
                        for d in group
                    ]
                    dets = tta.aggregate_sample(dets, group_idxs, cfg.DD3D.NUM_CLASSES, poses)
                for ev in evaluators:
                    ev.process(dets)
    else:
        for c in range(0, len(dicts), chunk_size):
            dets = run_chunk(dicts[c : c + chunk_size])
            for ev in evaluators:
                ev.process(dets)
    results = {}
    for ev in evaluators:
        r = ev.evaluate()
        if r:
            results.update({f"tta/{k}": v for k, v in r.items()})
    _log_results(results)
    return results


if __name__ == "__main__":
    main()
