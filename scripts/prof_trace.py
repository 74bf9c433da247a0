#!/usr/bin/env python
"""Capture + summarize a TPU xplane trace of the train step or inference.

The reference has no profiling harness (SURVEY.md 5.1); this is the
device-level complement to utils/profiling.py: it jits the requested
program, records 3 steps with jax.profiler, then aggregates the 'XLA Ops'
timeline from the xplane proto by op kind and prints the top individual
ops — the tool that found the small-channel early-stage pathology
(f32[7,7,3,16] stem weight-gradient at 13 ms/step, C=16 elementwise
fusions wasting 7/8 of the vector lanes; see ROADMAP round-3 notes).

Usage:
  python scripts/prof_trace.py train  [batch] [--s2d]
  python scripts/prof_trace.py infer  [batch]
  python scripts/prof_trace.py parse  <path/to/*.xplane.pb>
"""
import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _summarize(path, top_n=25, dump_json=None):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            cat, catn, top = collections.Counter(), collections.Counter(), collections.Counter()
            topn = collections.Counter()
            total = 0.0
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9
                total += dur
                m = re.match(r"%?([a-zA-Z\-_]+)", name)
                cat[m.group(1) if m else name] += dur
                catn[m.group(1) if m else name] += 1
                top[name[:110]] += dur
                topn[name[:110]] += 1
            print(f"[{plane.name}] XLA Ops total {total:.1f} ms (all recorded steps)")
            print("-- by op kind:")
            for k, ms in cat.most_common(20):
                print(f"  {ms:9.2f} ms  n={catn[k]:5d}  {k}")
            print(f"-- top {top_n} individual ops:")
            for k, ms in top.most_common(top_n):
                print(f"  {ms:9.2f} ms  {k}")
            if dump_json:
                import json

                with open(dump_json, "w") as f:
                    json.dump(
                        {
                            "total_ms": total,
                            "by_kind_ms": dict(cat),
                            "by_kind_n": dict(catn),
                            "ops_ms": dict(top),
                            "ops_n": dict(topn),
                        },
                        f,
                    )
                print("dumped:", dump_json)


def _trace(fn, args, logdir, dump_json=None):
    import jax

    out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])[0])
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])[0])
    jax.profiler.stop_trace()
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    print("trace:", paths)
    for p in paths:
        _summarize(p, dump_json=dump_json)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "train"
    dump_json = None
    for a in list(sys.argv[2:]):
        if a.startswith("--json="):
            dump_json = a.split("=", 1)[1]
            sys.argv.remove(a)
    if mode == "parse":
        _summarize(sys.argv[2], dump_json=dump_json)
        return
    import jax

    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.models import build_model

    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 16
    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    if "--s2d" in sys.argv:
        cfg.TPU.S2D_STEM = True
    if "--fold" in sys.argv:
        cfg.TPU.S2D_STEM_FOLD = True
    if "--base4" in sys.argv:
        cfg.TPU.S2D_BASE4 = True
    model = build_model(cfg)
    if mode == "train":
        if "--int8" in sys.argv:
            # Quantization is eval-only by design (round() has zero gradient;
            # the train step forces QUANT_INT8 off at trace time).
            print("NOTE: --int8 has no effect in train mode; profiling bf16 training.")
        from bench_train_scan import synth_batch

        from dd3d_tpu.training.train_loop import create_train_state
        from dd3d_tpu.training.train_step import make_train_step

        batch = synth_batch(batch_size)
        state = create_train_state(cfg, model, batch)
        step = jax.jit(make_train_step(cfg, model))
        _trace(lambda s, b: step(s, b)[1], (state, batch), f"/tmp/jtrace_train{batch_size}_{os.getpid()}", dump_json)
    else:
        import jax.numpy as jnp

        from dd3d_tpu.models.dd3d import dd3d_inference

        rng = np.random.RandomState(0)
        # uint8: what the real loader feeds the device (and bench.py since
        # round 5) — keeps the traced program identical to the shipped one.
        images = jnp.asarray((rng.rand(batch_size, 384, 1280, 3) * 255).astype(np.uint8))
        k = np.array([[721.5, 0, 609.5], [0, 721.5, 172.8], [0, 0, 1]], np.float32)
        intrinsics = jnp.asarray(np.tile(k, (batch_size, 1, 1)))
        variables = model.init(jax.random.PRNGKey(0), images[:1], train=False)

        if "--int8" in sys.argv:
            # Mirror bench.py's shipped static-int8 config exactly (the
            # shared helper IS what bench.py runs, so they cannot drift).
            from dd3d_tpu.models.calibrate import prepare_static_scales

            cfg.TPU.QUANT_INT8 = True
            cfg.TPU.QUANT_MIN_CH = 32
            cfg = prepare_static_scales(cfg, model, variables, [images], tag="prof")

        @jax.jit
        def infer(v, im, intr):
            import dd3d_tpu.models.layers as L

            L.set_quant_from_cfg(cfg)
            return dd3d_inference(cfg, model.apply(v, im, train=False), intr)

        _trace(infer, (variables, images, intrinsics), f"/tmp/jtrace_infer{batch_size}_{os.getpid()}", dump_json)


if __name__ == "__main__":
    main()
