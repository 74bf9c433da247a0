"""Pack small FPN levels into one guard-banded canvas for the shared heads.

The FCOS heads apply the SAME tower/predictor convs to every FPN level
(tridet/modeling/dd3d/fcos2d.py:96-116, fcos3d.py:121-150). Run separately,
the P4..P7 calls are tiny (e.g. 3x10 spatial at P7 for a 384x1280 input) —
overhead- and tiling-bound on the MXU, and they multiply the program's HLO
op count by the level count. Because a SAME-padded conv sees zeros beyond
each level's edge, several levels can be packed into one canvas separated by
zero guard bands and processed by ONE conv call per layer with *identical*
results, provided the guard bands are re-zeroed before every conv:

- guard gap of 1 pixel >= radius of a 3x3 conv: a level-edge output reads
  only its own pixels plus zeros — exactly its standalone zero padding;
- the per-level norm affine (folded running stats / FrozenBN) becomes a
  per-PIXEL (mul, add) map assembled from each level's per-channel affine,
  with ZEROS on the guard bands — applying it both realizes the per-level
  norm and restores the zero-gap invariant for the next layer;
- per-level scalar Scales/Offsets and per-level predictor weights are
  applied after unpacking (they are O(output)-sized, not tower-sized).

Packing covers BOTH graphs: at eval the affines come from frozen/running
statistics; in train mode each live BN computes its batch statistics from
the level's slice of the canvas (identical values to the standalone level
tensor — the guard bands are excluded by construction) and updates its
running averages, so outputs, stat updates, and gradients all match the
per-level path (tests/test_level_pack.py). Layout cost: shelf packing
below yields a canvas ~1.15x the summed level areas for the shipped FPN
shapes, against a 4x reduction in head conv calls for the packed group.

Measured on v5e (scripts/bench_packed_ab.py, bench_train_packed_ab.py):
the -41% conv-op-count reduction does NOT pay at the shipped batch sizes —
inference batch 128: 597.2 unpacked vs 586.4 packed imgs/s (-1.8%);
train batch 40: 163.0 vs 156.7 imgs/s (-3.9%). The canvas repack/unpack
copies plus the 1.15x padded-area compute outweigh the dispatch savings
once the batch axis is large enough to keep the small levels MXU-busy.
Both gates (TPU.PACKED_HEADS / PACKED_HEADS_TRAIN) therefore default False;
the path stays exact and tested for small-batch / latency-bound serving
where per-op dispatch dominates.
"""
from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
from jax import lax


class PackPlan(NamedTuple):
    canvas_hw: Tuple[int, int]
    # (row, col) placement per level, in input order.
    places: Tuple[Tuple[int, int], ...]
    shapes: Tuple[Tuple[int, int], ...]


def make_pack_plan(shapes: Sequence[Tuple[int, int]], gap: int = 1) -> PackPlan:
    """Shelf-pack (h, w) level shapes into one canvas with `gap` zero pixels
    between any two placements. Canvas height = tallest level; levels are
    placed left-to-right, stacking into an existing column when they fit
    under it. Shapes are expected tallest-first (FPN order)."""
    canvas_h = max(h for h, _ in shapes)
    # open shelves: [col_start, col_width, next_free_row]
    shelves: List[List[int]] = []
    canvas_w = 0
    places = []
    for h, w in shapes:
        placed = False
        for shelf in shelves:
            if w <= shelf[1] and shelf[2] + h <= canvas_h:
                places.append((shelf[2], shelf[0]))
                shelf[2] += h + gap
                placed = True
                break
        if not placed:
            col = canvas_w + (gap if shelves else 0)
            shelves.append([col, w, h + gap])
            places.append((0, col))
            canvas_w = col + w
    return PackPlan((canvas_h, canvas_w), tuple(places), tuple((h, w) for h, w in shapes))


def pack_levels(feats: List[jnp.ndarray], plan: PackPlan) -> jnp.ndarray:
    """(B, h_l, w_l, C) levels -> (B, H, W, C) canvas, zeros elsewhere."""
    b, _, _, c = feats[0].shape
    canvas = jnp.zeros((b, *plan.canvas_hw, c), dtype=feats[0].dtype)
    for feat, (r, col) in zip(feats, plan.places):
        canvas = lax.dynamic_update_slice(canvas, feat.astype(canvas.dtype), (0, r, col, 0))
    return canvas


def unpack_levels(canvas: jnp.ndarray, plan: PackPlan) -> List[jnp.ndarray]:
    return [
        canvas[:, r : r + h, col : col + w, :]
        for (r, col), (h, w) in zip(plan.places, plan.shapes)
    ]


def build_affine_maps(
    plan: PackPlan,
    affines: Sequence[Optional[Tuple[jnp.ndarray, jnp.ndarray]]],
    channels: int,
    dtype: Any,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel (mul, add) maps of shape (H, W, C) realizing each level's
    per-channel affine on its region and (0, 0) on guard bands / unused
    canvas. `affines[l]` is (mul, add) fp32 vectors, or None for identity
    (no norm — the map still zeroes the gaps)."""
    h, w = plan.canvas_hw
    mul_map = jnp.zeros((h, w, channels), dtype=dtype)
    add_map = jnp.zeros((h, w, channels), dtype=dtype)
    for aff, (r, col), (lh, lw) in zip(affines, plan.places, plan.shapes):
        if aff is None:
            mul = jnp.ones((channels,), dtype=dtype)
            add = jnp.zeros((channels,), dtype=dtype)
        else:
            mul, add = (a.astype(dtype) for a in aff)
        mul_map = lax.dynamic_update_slice(
            mul_map, jnp.broadcast_to(mul, (lh, lw, channels)), (r, col, 0)
        )
        add_map = lax.dynamic_update_slice(
            add_map, jnp.broadcast_to(add, (lh, lw, channels)), (r, col, 0)
        )
    return mul_map, add_map


def packed_tower_layer(x, conv, norm, plan: PackPlan, group, channels: int,
                       dtype, train: bool, activation=None):
    """One shared tower layer over a packed canvas: conv -> per-level norm
    affine as a per-pixel map (re-zeroing the guard bands) -> activation.
    The single home of the guard-band invariant for all heads (fcos2d,
    fcos3d, nuscenes) — keep the logic here, not in the callers."""
    import flax.linen as nn

    y = conv(x)
    # In train mode each live norm takes its level's slice to compute batch
    # statistics (and update running averages); frozen norms ignore it.
    slices = unpack_levels(y, plan) if train else [None] * len(group)
    affs = [norm(slices[i], l, train, affine_query=True) for i, l in enumerate(group)]
    m, a = build_affine_maps(plan, affs, channels, dtype)
    y = y * m + a
    return activation(y) if activation is not None else nn.relu(y)


def head_groups(
    features: List[jnp.ndarray], pack: bool
) -> List[List[int]]:
    """Level grouping for a shared head: singleton groups (the per-level
    path) unless packing is on, in which case every level except the
    largest packs into one canvas. The largest level (P3 — ~3/4 of all head
    FLOPs) stays standalone: packing it would pad every smaller level's
    column to its height, costing more FLOPs than the saved dispatch."""
    n = len(features)
    if not pack or n < 3:
        return [[l] for l in range(n)]
    return [[0], list(range(1, n))]
