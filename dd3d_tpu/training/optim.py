"""Optimizer + LR schedule, rebuild of the reference solver.

The reference uses detectron2's `build_optimizer`/`build_lr_scheduler`
(scripts/train.py:83-84): SGD momentum 0.9, weight decay 1e-4 with
WEIGHT_DECAY_NORM (default 0) on normalization affine params, and
WarmupMultiStepLR (linear warmup to BASE_LR then x GAMMA at each step).

Rebuilt on optax. bf16 training needs no GradScaler (replaces the AMP
GradScaler logic of scripts/train.py:105-147).
"""
from typing import NamedTuple, Sequence

import jax
import jax.flatten_util  # registers jax.flatten_util.ravel_pytree
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


class FusedSGDState(NamedTuple):
    count: jnp.ndarray  # schedule step
    trace: jnp.ndarray  # flat momentum buffer (fp32, len = total params)


def fused_sgd(
    schedule,
    momentum: float,
    nesterov: bool,
    weight_decay: float,
    wd_mask_flat,  # np.bool_ vector, len = total params (built once on host)
    clip_norm: float = 0.0,
    clip_value: float = 0.0,
) -> optax.GradientTransformation:
    """Flat-vector SGD: ravel the whole gradient/param pytree into ONE fp32
    vector and run clip + weight decay + momentum + lr as a handful of
    vector ops, instead of the optax chain's per-leaf walk (~250 leaves x
    ~8 transforms ≈ 2000 tiny HLO ops per step — measured ~8.6 ms of the
    batch-16 step on v5e; the concat/slice ravel round-trip is ~0.3 ms of
    HBM traffic at DLA-34's 17M params).

    Semantics match optax.chain(clip?, add_decayed_weights(wd, mask),
    sgd(schedule, momentum, nesterov)) exactly — pinned by
    tests/test_fused_sgd.py. The optax trace convention is used
    (m = g + mu*m, update = g + mu*m_new when nesterov)."""

    def init(params):
        flat, _ = jax.flatten_util.ravel_pytree(params)
        return FusedSGDState(count=jnp.zeros((), jnp.int32), trace=jnp.zeros_like(flat))

    def update(grads, state, params):
        if params is None:
            raise ValueError("fused_sgd requires params")
        flat_g, unravel = jax.flatten_util.ravel_pytree(grads)
        flat_p, _ = jax.flatten_util.ravel_pytree(params)
        flat_g = flat_g.astype(jnp.float32)
        if clip_value > 0.0:
            flat_g = jnp.clip(flat_g, -clip_value, clip_value)
        if clip_norm > 0.0:
            gnorm = jnp.sqrt(jnp.sum(flat_g * flat_g))
            flat_g = flat_g * jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-12))
        if weight_decay > 0.0:
            flat_g = flat_g + weight_decay * jnp.where(wd_mask_flat, flat_p, 0.0)
        new_trace = flat_g + momentum * state.trace
        upd = flat_g + momentum * new_trace if nesterov else new_trace
        lr = schedule(state.count)
        flat_upd = -lr * upd
        return unravel(flat_upd), FusedSGDState(count=state.count + 1, trace=new_trace)

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    sol = cfg.SOLVER
    schedule = warmup_multistep_schedule(
        sol.BASE_LR, sol.STEPS, sol.GAMMA, sol.WARMUP_FACTOR, sol.WARMUP_ITERS, sol.WARMUP_METHOD
    )
    if bool(sol.get("FUSED_SGD", True)):
        import numpy as np

        mask_tree = _wd_mask(params, sol.WEIGHT_DECAY_NORM == 0.0)
        mask_flat = np.concatenate(
            [
                np.full(int(np.prod(np.shape(p))), bool(m), np.bool_)
                for p, m in zip(
                    jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(mask_tree)
                )
            ]
        )
        clip_norm = clip_value = 0.0
        if sol.CLIP_GRADIENTS.ENABLED:
            if sol.CLIP_GRADIENTS.CLIP_TYPE == "value":
                clip_value = float(sol.CLIP_GRADIENTS.CLIP_VALUE)
            else:
                clip_norm = float(sol.CLIP_GRADIENTS.CLIP_VALUE)
        tx = fused_sgd(
            schedule,
            momentum=sol.MOMENTUM,
            nesterov=sol.NESTEROV,
            weight_decay=float(sol.WEIGHT_DECAY),
            wd_mask_flat=mask_flat,
            clip_norm=clip_norm,
            clip_value=clip_value,
        )
        if sol.get("ACCUMULATE_GRAD_BATCHES", 1) > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=sol.ACCUMULATE_GRAD_BATCHES)
        return tx
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
