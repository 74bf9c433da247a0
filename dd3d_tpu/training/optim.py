"""Optimizer + LR schedule, rebuild of the reference solver.

The reference uses detectron2's `build_optimizer`/`build_lr_scheduler`
(scripts/train.py:83-84): SGD momentum 0.9, weight decay 1e-4 with
WEIGHT_DECAY_NORM (default 0) on normalization affine params, and
WarmupMultiStepLR (linear warmup to BASE_LR then x GAMMA at each step).

Rebuilt on optax. bf16 training needs no GradScaler (replaces the AMP
GradScaler logic of scripts/train.py:105-147).
"""
from typing import Sequence

import jax.numpy as jnp
import optax


def warmup_multistep_schedule(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    warmup_factor: float = 1e-4,
    warmup_iters: int = 2000,
    warmup_method: str = "linear",
):
    """d2 WarmupMultiStepLR semantics: lr = base * warmup(t) * gamma^k."""
    steps = tuple(int(s) for s in steps)

    def schedule(count):
        count = jnp.asarray(count, dtype=jnp.float32)
        if warmup_method == "linear":
            alpha = jnp.clip(count / max(warmup_iters, 1), 0.0, 1.0)
            warm = jnp.where(count < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0)
        elif warmup_method == "constant":
            warm = jnp.where(count < warmup_iters, warmup_factor, 1.0)
        else:
            raise ValueError(warmup_method)
        k = sum((count >= s).astype(jnp.float32) for s in steps)
        return base_lr * warm * (gamma ** k)

    return schedule


def _wd_mask(params, weight_decay_norm_is_zero: bool):
    """Weight-decay mask: norm affine params are excluded when
    WEIGHT_DECAY_NORM == 0 (the reference default)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    mask = {}
    for path in flat:
        is_norm = any(str(p).startswith("norm") for p in path)
        mask[path] = not (is_norm and weight_decay_norm_is_zero)
    return flax.traverse_util.unflatten_dict(mask)


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    sol = cfg.SOLVER
    schedule = warmup_multistep_schedule(
        sol.BASE_LR, sol.STEPS, sol.GAMMA, sol.WARMUP_FACTOR, sol.WARMUP_ITERS, sol.WARMUP_METHOD
    )
    chain = []
    if sol.CLIP_GRADIENTS.ENABLED:
        if sol.CLIP_GRADIENTS.CLIP_TYPE == "value":
            chain.append(optax.clip(sol.CLIP_GRADIENTS.CLIP_VALUE))
        else:
            chain.append(optax.clip_by_global_norm(sol.CLIP_GRADIENTS.CLIP_VALUE))
    if sol.WEIGHT_DECAY > 0:
        chain.append(
            optax.add_decayed_weights(
                sol.WEIGHT_DECAY, mask=_wd_mask(params, sol.WEIGHT_DECAY_NORM == 0.0)
            )
        )
    chain.append(optax.sgd(learning_rate=schedule, momentum=sol.MOMENTUM, nesterov=sol.NESTEROV))
    tx = optax.chain(*chain)
    if sol.get("ACCUMULATE_GRAD_BATCHES", 1) > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=sol.ACCUMULATE_GRAD_BATCHES)
    return tx
