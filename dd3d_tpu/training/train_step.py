"""The jitted global-batch train step.

Replaces the whole Python-side training inner loop of the reference
(`do_train`, scripts/train.py:81-194: AMP autocast + GradScaler + manual
accumulation + DDP all-reduce) with ONE compiled XLA program:
forward (bf16) -> losses (fp32) -> grad -> optimizer update, over a batch
sharded along the mesh's `data` axis. Gradients, BN statistics, and loss
normalizers become XLA all-reduces over ICI automatically.

Loss finiteness guard (scripts/train.py:127-132) is returned as a metric
rather than a Python-side assert so the step never syncs the host.
"""
from typing import Any, Dict, Tuple

import jax
import jax.flatten_util  # registers jax.flatten_util.ravel_pytree
import jax.numpy as jnp
import optax
from flax import struct

from dd3d_tpu.models.dd3d import dd3d_losses, model_strides


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )


def _select_loss_fn(cfg):
    """Loss path follows the meta-architecture, mirroring the reference where
    each meta-arch owns its losses (DD3D core.py:95-112, NuscenesLoss
    nuscenes_dd3d.py:199-265, DD3DDenseDepth dense_depth.py:165-171)."""
    meta_arch = cfg.MODEL.META_ARCHITECTURE
    if meta_arch == "NuscenesDD3D":
        from dd3d_tpu.models.nuscenes_dd3d import nuscenes_dd3d_losses

        return nuscenes_dd3d_losses
    if meta_arch == "DD3DDenseDepth":
        from dd3d_tpu.models.dense_depth import dd3d_dense_depth_losses

        return dd3d_dense_depth_losses
    return dd3d_losses


def make_train_step(cfg, model, loss_fn=None):
    """Build the pure train-step function (to be jitted by the caller with
    donate_argnums=(0,) so buffers are reused in place)."""
    loss_fn = loss_fn or _select_loss_fn(cfg)
    strides = model_strides(model)
    dense_depth = cfg.MODEL.META_ARCHITECTURE == "DD3DDenseDepth"

    # TPU.REMAT: "none" (default) stores all activations; "full" recomputes
    # the forward during backward (jax.checkpoint), trading ~1/3 more FLOPs
    # for the activation memory — enables ~2x larger per-chip batches
    # (batch-32 at 384x1280 OOMs 16G HBM without it). Any other value is a
    # named optax/jax checkpoint policy (e.g.
    # "dots_with_no_batch_dims_saveable") applied as a selective policy —
    # matmul outputs are saved, elementwise chains recomputed.
    remat = str(cfg.TPU.get("REMAT", "none"))

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # Trace-time only: int8 PTQ is inference-only — round() has zero
        # gradient, so a quantized FrozenBN backbone would silently stop
        # training (see layers.set_quant_from_cfg).
        import dd3d_tpu.models.layers as _L

        _L.QUANT_INT8 = False
        images = batch["image"]
        if "color_jitter" in batch:
            from dd3d_tpu.ops.color_jitter import apply_color_jitter

            images = apply_color_jitter(images, batch["color_jitter"])

        if dense_depth:
            inv_k = jnp.linalg.inv(batch["intrinsics"].astype(jnp.float32))

            def apply_model(params, images):
                return model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images,
                    inv_intrinsics=inv_k,
                    train=True,
                    mutable=["batch_stats"],
                )
        else:
            def apply_model(params, images):
                return model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    images,
                    train=True,
                    mutable=["batch_stats"],
                )

        if remat == "full":
            apply_model = jax.checkpoint(apply_model)
        elif remat not in ("none", ""):
            policy = getattr(jax.checkpoint_policies, remat, None)
            if policy is None:
                raise ValueError(f"Unknown TPU.REMAT policy {remat!r}")
            apply_model = jax.checkpoint(apply_model, policy=policy)

        def compute_loss(params):
            outputs, new_model_state = apply_model(params, images)
            losses = loss_fn(cfg, outputs, batch, strides=strides)
            total = sum(losses.values())
            return total, (losses, new_model_state["batch_stats"])

        (total, (losses, new_batch_stats)), grads = jax.value_and_grad(compute_loss, has_aux=True)(state.params)

        updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        metrics = {**losses, "total_loss": total}
        # Flat-vector norm: one concat + one reduction instead of
        # optax.global_norm's per-leaf walk (~750 tiny HLO ops).
        flat_g, _ = jax.flatten_util.ravel_pytree(grads)
        metrics["grad_norm"] = jnp.sqrt(jnp.sum(flat_g.astype(jnp.float32) ** 2))
        metrics["loss_finite"] = jnp.isfinite(total).astype(jnp.float32)

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return train_step
