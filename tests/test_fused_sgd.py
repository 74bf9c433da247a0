"""fused_sgd (flat-vector SGD, training/optim.py) must match the optax chain
it replaces — optax.chain(clip?, add_decayed_weights(wd, mask),
sgd(schedule, momentum, nesterov)) — exactly, step for step, including the
WEIGHT_DECAY_NORM==0 norm-param mask and WarmupMultiStepLR."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dd3d_tpu.configs import get_cfg
from dd3d_tpu.training.optim import build_optimizer


def _toy_params(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "backbone": {
            "conv1": {"kernel": jnp.asarray(rng.randn(3, 3, 4, 8).astype(np.float32))},
            "norm1": {"scale": jnp.asarray(rng.randn(8).astype(np.float32)),
                      "bias": jnp.asarray(rng.randn(8).astype(np.float32))},
        },
        "head": {
            "dense": {"kernel": jnp.asarray(rng.randn(8, 5).astype(np.float32)),
                      "bias": jnp.asarray(rng.randn(5).astype(np.float32))},
        },
    }


def _grads_like(params, seed):
    rng = np.random.RandomState(seed)
    return jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32)), params
    )


def _cfg(clip_enabled=False, clip_type="value", nesterov=False, momentum=0.9, wd=1e-4):
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.MOMENTUM = momentum
    cfg.SOLVER.NESTEROV = nesterov
    cfg.SOLVER.WEIGHT_DECAY = wd
    cfg.SOLVER.WEIGHT_DECAY_NORM = 0.0
    cfg.SOLVER.STEPS = [3, 6]
    cfg.SOLVER.WARMUP_ITERS = 4
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = clip_enabled
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = clip_type
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 0.05
    return cfg


@pytest.mark.parametrize(
    "kwargs",
    [
        {},  # plain SGD + momentum + masked WD
        {"nesterov": True},
        {"momentum": 0.0, "wd": 0.0},
        {"clip_enabled": True, "clip_type": "value"},
        {"clip_enabled": True, "clip_type": "norm"},
    ],
)
def test_fused_matches_optax_chain(kwargs):
    cfg = _cfg(**kwargs)
    params = _toy_params()

    cfg.SOLVER.FUSED_SGD = True
    tx_f = build_optimizer(cfg, params)
    cfg.SOLVER.FUSED_SGD = False
    tx_o = build_optimizer(cfg, params)

    p_f = p_o = params
    s_f, s_o = tx_f.init(params), tx_o.init(params)
    import optax

    for step in range(8):  # crosses warmup end (4) and both milestones (3, 6)
        grads = _grads_like(params, seed=step + 1)
        u_f, s_f = tx_f.update(grads, s_f, p_f)
        u_o, s_o = tx_o.update(grads, s_o, p_o)
        p_f = optax.apply_updates(p_f, u_f)
        p_o = optax.apply_updates(p_o, u_o)
        for kf, ko in zip(jax.tree_util.tree_leaves(p_f), jax.tree_util.tree_leaves(p_o)):
            np.testing.assert_allclose(np.asarray(kf), np.asarray(ko), rtol=0, atol=1e-6)


def test_wd_mask_excludes_norm_params():
    """With zero grads, WD must move conv/dense weights but leave norm
    scale/bias untouched (WEIGHT_DECAY_NORM == 0 reference default)."""
    cfg = _cfg()
    params = _toy_params()
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
    upd, _ = tx.update(zero_g, state, params)
    assert np.any(np.asarray(upd["backbone"]["conv1"]["kernel"]) != 0)
    assert np.all(np.asarray(upd["backbone"]["norm1"]["scale"]) == 0)
    assert np.all(np.asarray(upd["backbone"]["norm1"]["bias"]) == 0)


def test_fused_under_multisteps_accumulation():
    cfg = _cfg()
    cfg.SOLVER.ACCUMULATE_GRAD_BATCHES = 2
    params = _toy_params()
    cfg.SOLVER.FUSED_SGD = True
    tx_f = build_optimizer(cfg, params)
    cfg.SOLVER.FUSED_SGD = False
    tx_o = build_optimizer(cfg, params)
    import optax

    p_f = p_o = params
    s_f, s_o = tx_f.init(params), tx_o.init(params)
    for step in range(4):
        grads = _grads_like(params, seed=step + 10)
        u_f, s_f = tx_f.update(grads, s_f, p_f)
        u_o, s_o = tx_o.update(grads, s_o, p_o)
        p_f = optax.apply_updates(p_f, u_f)
        p_o = optax.apply_updates(p_o, u_o)
    for kf, ko in zip(jax.tree_util.tree_leaves(p_f), jax.tree_util.tree_leaves(p_o)):
        np.testing.assert_allclose(np.asarray(kf), np.asarray(ko), rtol=0, atol=1e-6)
