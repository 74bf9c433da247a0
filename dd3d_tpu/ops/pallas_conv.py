"""Pallas weight-gradient kernel for the small-channel stride-1 stem convs.

Why: XLA assigns the stem's weight-gradient convolutions BATCH-MINOR
layouts (bf16[40,192,640,12]{0,3,2,1}: batch on the 128-lane axis, 40
padded to 128 => ~3.2x wasted HBM + MXU occupancy). The s2d stem's
[5,5,12,64] dW alone measured 11.5 ms/step at batch 40 (~2% MFU; xplane
trace, ROADMAP round-4) against a ~1 ms roofline. This kernel computes

    dW[dh, dw, ci, co] = sum_{b,h,w} xpad[b, h+dh, w+dw, ci] * dy[b,h,w,co]

by streaming row slabs through VMEM and issuing ONE MXU contraction per
slab with all K*K shift offsets STACKED into the M dimension
(X_cat[K*K*CI, TH, W] . dy[TH, W, CO] -> [K*K*CI, CO]), so M fills MXU
row tiles (300 for the 5x5x12 stem, 576 for 3x3x64 level0) instead of the
12 rows a per-offset contraction would use. f32 accumulation across the
whole grid in the output block.

Used via `conv2d_s1_same` (jax.custom_vjp): forward and dx stay on XLA's
conv emitter (those run fine); only dW is replaced. Gated by
TPU.PALLAS_STEM_DW. cf. the stem being trained,
tridet/modeling/feature_extractor/dla.py:250-355 (the reference trains it
with cuDNN; this is TPU-only performance work with no reference analogue).

MEASURED DEAD END (v5e, batch 40, scripts/bench_pallas_dw.py; ROADMAP
"Round-5 Pallas stem dW"): after three kernel iterations (naive slab,
cross-step double-buffered DMA, host-side dw-pre-shift to kill in-kernel
lane rotates) the kernel is 0.85x XLA on the [5,5,12,64] stem dW and
0.39x on the [3,3,64,64] level0 dW — the slab relayouts + per-step
overhead + the CO=64 half-empty lane tiles cost more than XLA's
batch-minor padding wastes. Kept (exact, tested, gated off) as the
documented measurement; see the ROADMAP entry for the component timings.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(h: int, k: int, ci: int, w: int) -> int:
    """Rows per slab: keep X_cat (K*K*CI x TH x W bf16) around <= ~6 MB.

    Must be a multiple of 8 that divides h: Mosaic requires HBM DMA slice
    sizes/offsets tile-aligned (8 on the sublane axis), and the kernel
    copies th+8 rows at offset t*th.
    """
    budget = 6 * 1024 * 1024
    per_row = k * k * ci * w * 2
    th = max(8, budget // per_row)
    for cand in range(min(th, h) // 8 * 8, 0, -8):
        if h % cand == 0:
            return cand
    raise ValueError(f"no tile-aligned slab height for h={h}")


def _dw_kernel(k, th, wq, nt, nsteps, ci, co,
               xp_ref, dyt_ref, out_ref, x_slabs, dy_slabs, sems):
    s = pl.program_id(0)

    # Double-buffered slab DMAs: step s waits on slot s%2 (started at s-1)
    # and prefetches slot (s+1)%2, so HBM reads overlap the contraction.
    # th + 8 rows (not th + k - 1): Mosaic DMA slice sizes must be
    # 8-row-aligned; the extra zero rows are copied but never read.
    def dma_x(slot, step):
        b, t = step // nt, step % nt
        return pltpu.make_async_copy(
            xp_ref.at[b, :, pl.ds(t * th, th + 8), :], x_slabs.at[slot],
            sems.at[0, slot])

    def dma_dy(slot, step):
        b, t = step // nt, step % nt
        return pltpu.make_async_copy(
            dyt_ref.at[b, :, pl.ds(t * th, th), :], dy_slabs.at[slot],
            sems.at[1, slot])

    @pl.when(s == 0)
    def _():
        dma_x(0, 0).start()
        dma_dy(0, 0).start()
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(s + 1 < nsteps)
    def _():
        dma_x((s + 1) % 2, s + 1).start()
        dma_dy((s + 1) % 2, s + 1).start()

    slot = s % 2
    dma_x(slot, s).wait()
    dma_dy(slot, s).wait()

    # Stack the K row shifts into M: [K*(K*CI), TH, WQ], then flatten
    # pixels — Mosaic's matmul needs a single contracting dim. The column
    # (dw) shifts were pre-baked into the K*CI channel blocks host-side,
    # so every lane slice here is aligned (lane rotates were the whole
    # cost of the naive 25-shift version). Columns >= W carry zero dy, so
    # their x values contribute nothing.
    shifts = [x_slabs[slot, :, dh : dh + th, :] for dh in range(k)]
    x_cat = jnp.concatenate(shifts, axis=0).reshape(k * k * ci, th * wq)
    contrib = jax.lax.dot_general(
        x_cat,
        dy_slabs[slot].reshape(co, th * wq),
        dimension_numbers=(((1,), (1,)), ((), ())),  # rhs transposed
        preferred_element_type=jnp.float32,
    )  # [K*K*CI, CO]

    out_ref[...] += contrib


def conv_dw_s1_same_pallas(x, dy, k: int, interpret: bool = False):
    """dW (HWIO, f32) of a stride-1 SAME NHWC conv with an ODD k x k kernel.

    x: (B, H, W, CI) input activations; dy: (B, H, W, CO) output cotangent.
    """
    assert k % 2 == 1, "stride-1 SAME backward needs an odd kernel"
    assert k <= 9, "slab halo is 8 rows"
    b, h, w, ci = x.shape
    co = dy.shape[-1]
    p = (k - 1) // 2
    th = _pick_th(h, k, ci, w)
    # Layouts (Mosaic DMA slices must be tile-aligned: 8 on the sublane
    # axis, 128 on lanes; in-kernel LANE slices at unaligned offsets
    # compile to lane rotates, which dominated the naive version):
    #  xp5 [B, K*CI, H+P+PB, WQ]: channel block dw holds x pre-shifted by
    #      dw columns (built by XLA slices below, where unaligned offsets
    #      are just bandwidth), so the kernel's lane axis is W — never
    #      the 12-wide channel axis XLA's batch-minor layout starves on —
    #      and every in-kernel lane access is offset-0 aligned. Bottom
    #      pad PB >= 8-P keeps the last slab's th+8-row DMA in bounds
    #      (rows past P are zeros never read).
    #  dyt [B, CO, H, WQ]: pixels on the tiled axes (CO=64 can't be a
    #      sliced 128-lane axis), WQ = W rounded up to x128 with ZERO
    #      columns, which contribute nothing to the contraction.
    pb = max(p, 8 - p)
    wq = -(-w // 128) * 128
    xpad = jnp.pad(x, ((0, 0), (p, pb), (p, wq + k - 1 - w - p), (0, 0)))
    xp5 = jnp.concatenate(
        [xpad[:, :, dw : dw + wq, :] for dw in range(k)], axis=-1
    ).transpose(0, 3, 1, 2)
    dyt = jnp.pad(dy, ((0, 0), (0, 0), (0, wq - w), (0, 0))).transpose(0, 3, 1, 2)

    nt = h // th
    nsteps = b * nt
    kernel = functools.partial(_dw_kernel, k, th, wq, nt, nsteps, ci, co)
    out = pl.pallas_call(
        kernel,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((k * k * ci, co), lambda s_: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((k * k * ci, co), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, k * ci, th + 8, wq), x.dtype),
            pltpu.VMEM((2, co, th, wq), dy.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp5, dyt)
    return out.reshape(k, k, ci, co)


def _conv_s1_same(x, wt):
    k = wt.shape[0]
    p = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, wt, window_strides=(1, 1), padding=[(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv2d_s1_same(x, wt, interpret: bool = False):
    """Stride-1 SAME NHWC/HWIO conv whose weight-gradient uses the Pallas
    slab kernel above; forward and dx are XLA's conv emitter (unchanged).
    Gradient parity vs jax.vjp of the plain conv is pinned by
    tests/test_pallas_conv.py (f64-oracle pattern of tests/test_s2d_stem.py).
    """
    return _conv_s1_same(x, wt)


def _fwd(x, wt, interpret):
    return _conv_s1_same(x, wt), (x, wt)


def _bwd(interpret, res, dy):
    x, wt = res
    # dx: correlate dy with the spatially-flipped kernel, in/out swapped —
    # exact for stride 1 + symmetric SAME padding with odd k.
    wr = wt[::-1, ::-1].transpose(0, 1, 3, 2)
    dx = _conv_s1_same(dy, wr).astype(x.dtype)
    dw = conv_dw_s1_same_pallas(x, dy, wt.shape[0], interpret=interpret).astype(wt.dtype)
    return dx, dw


conv2d_s1_same.defvjp(_fwd, _bwd)


def pallas_dw_supported(x_shape, k: int) -> bool:
    """Shapes this kernel handles: odd k<=9, H with an 8-aligned slab."""
    return (
        k % 2 == 1 and k <= 9 and len(x_shape) == 4 and x_shape[1] % 8 == 0
    )
