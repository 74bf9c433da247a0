"""Checkpoint resume round-trip (VERDICT round-2 item 6): train 5 steps,
save via orbax, rebuild process-level state from scratch, restore, continue
5 steps — step counter, params, optimizer momentum, BN statistics and the
per-step losses must match an uninterrupted 10-step run.
cf. reference resume semantics: fvcore Checkpointer restoring
model+optimizer+scheduler (scripts/train.py:86,185-186)."""
import numpy as np
import jax
import pytest

from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.models import build_model
from dd3d_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from dd3d_tpu.training.checkpoint import CheckpointManager
from dd3d_tpu.training.train_loop import create_train_state
from dd3d_tpu.training.train_step import make_train_step

from tests.test_train_step import _tiny_batch


def _tiny_cfg():
    # identical shrink to test_train_step so the XLA program cache hits
    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    cfg.FE.BACKBONE.NAME = "DLA-46-C"
    cfg.FE.BUILDER = "build_fcos_dla_fpn_backbone_p6"
    cfg.FE.OUT_FEATURES = ["p3", "p4", "p5", "p6"]
    cfg.FE.FPN.OUT_CHANNELS = 64
    cfg.DD3D.FCOS2D.NUM_CLS_CONVS = 1
    cfg.DD3D.FCOS2D.NUM_BOX_CONVS = 1
    cfg.DD3D.FCOS3D.NUM_CONVS = 1
    return cfg


def _step_batch(step, bsh):
    """Deterministic per-step batch (jittered images so BN stats move)."""
    b = _tiny_batch(8)
    rng = np.random.RandomState(100 + step)
    img = np.asarray(b["image"]) + rng.rand(*b["image"].shape).astype(np.float32) * 10.0
    b["image"] = jax.numpy.asarray(img)
    return jax.device_put(b, bsh)


def _run(cfg, model, mesh, step_fn, state, start, stop, bsh):
    losses = []
    for it in range(start, stop):
        state, metrics = step_fn(state, _step_batch(it, bsh))
        losses.append(float(jax.device_get(metrics)["total_loss"]))
    return state, losses


@pytest.mark.slow
def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    cfg = _tiny_cfg()
    model = build_model(cfg)
    mesh = make_mesh(8)
    repl, bsh = replicated(mesh), batch_sharding(mesh)

    step_fn = jax.jit(
        make_train_step(cfg, model),
        donate_argnums=(0,),
        in_shardings=(repl, bsh),
        out_shardings=(repl, repl),
    )

    def fresh_state():
        s = create_train_state(cfg, model, _tiny_batch(8))
        return jax.device_put(s, repl)

    # uninterrupted 10 steps
    ref_state, ref_losses = _run(cfg, model, mesh, step_fn, fresh_state(), 0, 10, bsh)

    # interrupted: 5 steps -> save -> new state -> restore -> 5 more
    state, losses_a = _run(cfg, model, mesh, step_fn, fresh_state(), 0, 5, bsh)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    ckpt.save(int(state.step), jax.device_get(state))
    assert ckpt.latest_step() == 5

    state2 = fresh_state()  # fresh params/opt-state/BN, as after a restart
    state2 = ckpt.restore(state2)
    assert int(state2.step) == 5

    # restored tensors equal the saved ones exactly
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(jax.device_get(a), jax.device_get(b))
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(state2.opt_state)):
        np.testing.assert_array_equal(jax.device_get(a), jax.device_get(b))
    for a, b in zip(jax.tree.leaves(state.batch_stats), jax.tree.leaves(state2.batch_stats)):
        np.testing.assert_array_equal(jax.device_get(a), jax.device_get(b))

    state2 = jax.device_put(state2, repl)
    state2, losses_b = _run(cfg, model, mesh, step_fn, state2, 5, 10, bsh)

    assert int(state2.step) == int(ref_state.step) == 10
    np.testing.assert_allclose(losses_a + losses_b, ref_losses, rtol=1e-6)
    # final params, momentum and BN stats identical to the uninterrupted run
    for a, b in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(jax.device_get(a), jax.device_get(b), rtol=0, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_state.opt_state), jax.tree.leaves(state2.opt_state)):
        np.testing.assert_allclose(jax.device_get(a), jax.device_get(b), rtol=0, atol=1e-6)
    for a, b in zip(jax.tree.leaves(ref_state.batch_stats), jax.tree.leaves(state2.batch_stats)):
        np.testing.assert_allclose(jax.device_get(a), jax.device_get(b), rtol=0, atol=1e-6)
