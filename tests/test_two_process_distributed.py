"""REAL 2-process `jax.distributed` integration test (VERDICT round-2 item 3).

Spawns two genuine OS processes (coordinator on localhost, 4 virtual CPU
devices each, gloo cross-process collectives), runs 2 train steps over the
2-process/8-device mesh plus a sharded evaluation of the fixture dataset,
and asserts losses + eval metrics EQUAL the single-process 8-device run —
i.e. `jax.make_array_from_process_local_data`, the in-graph global-batch
collectives, `all_gather_objects` and `broadcast_from_master` all executed
over the real multi-process transport (no monkey-patching).
Replaces the transport layer of the simulated test in test_multihost_eval.py.
cf. mpirun semantics: reference Makefile:34-49, utils/setup.py:23-60.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "two_process_worker.py")
    port = _free_port()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORM_NAME", None)
    # Workers are pure-CPU: drop any TPU-plugin site hook from PYTHONPATH
    # (the axon hook blocks `import jax` outright while its tunnel is down,
    # which surfaced here as a 1500 s worker timeout).
    env["PYTHONPATH"] = ""

    outs = [str(tmp_path / f"rank{i}.json") for i in range(2)]

    def launch(port):
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(i), "2", str(port), outs[i]],
                cwd=repo, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for i in range(2)
        ]
        logs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=1500)
                logs.append(out.decode(errors="replace"))
        finally:
            # never leave orphans: they contend the CPU and starve the NEXT
            # run's jax.distributed initialization past its timeout
            for p in procs:
                if p.poll() is None:
                    p.kill()
        return procs, logs

    procs, logs = launch(port)
    if any(p.returncode != 0 for p in procs) and any(
        "Gloo context initialization failed: DEADLINE_EXCEEDED" in l for l in logs
    ):
        # Known environment flake, NOT a transport bug: Gloo's rendezvous has
        # a hard 30 s KV-wait, and on a contended 1-core box external load
        # (e.g. a concurrent TPU bench's host process) can skew the ranks'
        # pre-collective host work past it. Retry ONCE — a genuine pass over
        # the real transport is still required for the test to go green.
        # The marker below must stay LOUD (VERDICT r4 #8): if it shows up in
        # consecutive rounds' logs, treat it as a regression, not a flake —
        # see ROADMAP "2-process retry watch".
        print("\n" + "!" * 72, flush=True)
        print("!!! GLOO-RETRY-FIRED: 2-process rendezvous hit DEADLINE_EXCEEDED; "
              "retrying once on a fresh port !!!", flush=True)
        print("!" * 72 + "\n", flush=True)
        procs, logs = launch(_free_port())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"rank {i} failed:\n{logs[i][-4000:]}"

    results = [json.load(open(o)) for o in outs]
    for i, r in enumerate(results):
        assert r["world"] == 2 and r["rank"] == i
        assert r["n_global_devices"] == 8  # 2 processes x 4 local devices

    # the real object broadcast delivered rank 0's payload to rank 1
    assert results[1]["bcast"] == {"token": "from-rank-0", "values": [1, 2, 3]}

    # both ranks computed identical eval metrics after the real gather
    assert results[0]["eval"] == pytest.approx(results[1]["eval"])

    # TEST.RANK0_METRICS over the real transport: identical metrics on both
    # ranks, the AP engine ran ONCE (on rank 0; rank 1 got the broadcast) —
    # the reference's rank-0-only shape, kitti_3d_evaluator.py:158-161.
    assert results[0]["eval_rank0"] == pytest.approx(results[1]["eval_rank0"])
    assert results[0]["eval_rank0"] == pytest.approx(results[0]["eval"])
    assert [r["rank0_engine_calls"] for r in results] == [1, 0]

    # single-process reference (this pytest process: 8 local virtual devices)
    from tests.two_process_worker import run_workload

    ref = run_workload(dataset_name="two_proc_fixture_sp")

    # train losses: global batch is identical -> same numbers up to
    # cross-process reduction reordering (fp32 forward, see tiny_cfg; the
    # 2-process Gloo all-reduce orders differently than the 1-process
    # psum). A transport bug (double-count / dropped shard) would be ~2x.
    for step in range(2):
        for k, v in ref["losses"][step].items():
            np.testing.assert_allclose(
                results[0]["losses"][step][k], v, rtol=1e-3,
                err_msg=f"step {step} {k} (2-proc vs 1-proc)",
            )

    # eval metrics: sharded + gathered == unsharded
    assert set(ref["eval"]) == set(results[0]["eval"])
    for k, v in ref["eval"].items():
        np.testing.assert_allclose(results[0]["eval"][k], v, rtol=1e-9, err_msg=k)
