"""Packed-levels head path (models/level_pack.py) vs the per-level path.

The packed canvas must reproduce the per-level head outputs exactly (same
convs, zero guard bands == each level's own SAME zero padding, per-pixel
affine maps == per-level folded norms). Tests run in fp32 where the two
orderings agree to float tolerance.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dd3d_tpu.models.fcos2d import FCOS2DHead
from dd3d_tpu.models.fcos3d import FCOS3DHead
from dd3d_tpu.models.level_pack import (
    build_affine_maps,
    make_pack_plan,
    pack_levels,
    unpack_levels,
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


FPN_SHAPES = [(24, 80), (12, 40), (6, 20), (3, 10)]


def _feats(rng, shapes, c=32, b=2):
    return [jnp.asarray(rng.randn(b, h, w, c).astype(np.float32)) for h, w in shapes]


def test_pack_unpack_roundtrip(rng):
    feats = _feats(rng, FPN_SHAPES)
    plan = make_pack_plan(FPN_SHAPES)
    canvas = pack_levels(feats, plan)
    back = unpack_levels(canvas, plan)
    for f, g in zip(feats, back):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(g))


def test_pack_plan_guard_bands(rng):
    """Every placement is separated from every other (and only overlaps
    itself); guard bands stay zero in the packed canvas."""
    plan = make_pack_plan(FPN_SHAPES)
    h, w = plan.canvas_hw
    cover = np.zeros((h, w), dtype=np.int32)
    for (r, c), (lh, lw) in zip(plan.places, plan.shapes):
        assert r + lh <= h and c + lw <= w
        cover[r : r + lh, c : c + lw] += 1
    assert cover.max() == 1
    # any two distinct placements are >= 1 pixel apart (8-connected)
    grown = np.zeros((h + 2, w + 2), dtype=np.int32)
    for (r, c), (lh, lw) in zip(plan.places, plan.shapes):
        grown[r : r + lh + 2, c : c + lw + 2] += 1
    # a gap of >=1 means grown boxes may touch but never triple-overlap;
    # direct check: dilating each box by 1 must not overlap another box core.
    for i, ((r, c), (lh, lw)) in enumerate(zip(plan.places, plan.shapes)):
        region = np.zeros((h, w), dtype=bool)
        region[max(r - 1, 0) : r + lh + 1, max(c - 1, 0) : c + lw + 1] = True
        for j, ((r2, c2), (lh2, lw2)) in enumerate(zip(plan.places, plan.shapes)):
            if i == j:
                continue
            core = np.zeros((h, w), dtype=bool)
            core[r2 : r2 + lh2, c2 : c2 + lw2] = True
            assert not (region & core).any(), (i, j)

    feats = _feats(rng, FPN_SHAPES)
    canvas = np.asarray(pack_levels(feats, plan))
    mask = np.zeros((h, w), dtype=bool)
    for (r, c), (lh, lw) in zip(plan.places, plan.shapes):
        mask[r : r + lh, c : c + lw] = True
    assert np.all(canvas[:, ~mask, :] == 0)


def test_pack_plan_fuzz_invariants(rng):
    """Property test: for random shape lists (tallest-first, like FPN),
    every plan keeps placements in-bounds, pairwise >=1 px apart
    (8-connected), and pack->unpack is the identity."""
    for trial in range(50):
        n = rng.randint(2, 7)
        hs = np.sort(rng.randint(1, 40, size=n))[::-1]
        shapes = [(int(h), int(rng.randint(1, 60))) for h in hs]
        plan = make_pack_plan(shapes)
        h, w = plan.canvas_hw
        boxes = []
        for (r, c), (lh, lw) in zip(plan.places, plan.shapes):
            assert 0 <= r and 0 <= c and r + lh <= h and c + lw <= w, (trial, shapes)
            boxes.append((r, c, lh, lw))
        for i in range(n):
            r1, c1, h1, w1 = boxes[i]
            for j in range(i + 1, n):
                r2, c2, h2, w2 = boxes[j]
                # dilate box i by 1 and require no intersection with box j
                sep = (r1 - 1 >= r2 + h2 or r2 >= r1 + h1 + 1 or
                       c1 - 1 >= c2 + w2 or c2 >= c1 + w1 + 1)
                assert sep, (trial, shapes, i, j)
        feats = [jnp.asarray(rng.randn(1, lh, lw, 4).astype(np.float32)) for lh, lw in shapes]
        back = unpack_levels(pack_levels(feats, plan), plan)
        for f, g in zip(feats, back):
            np.testing.assert_array_equal(np.asarray(f), np.asarray(g))


def test_affine_maps_zero_gaps(rng):
    plan = make_pack_plan(FPN_SHAPES)
    c = 8
    affs = [
        (jnp.asarray(rng.rand(c).astype(np.float32)), jnp.asarray(rng.rand(c).astype(np.float32)))
        for _ in FPN_SHAPES
    ]
    m, a = build_affine_maps(plan, affs, c, jnp.float32)
    mask = np.zeros(plan.canvas_hw, dtype=bool)
    for (r, col), (lh, lw) in zip(plan.places, plan.shapes):
        mask[r : r + lh, col : col + lw] = True
    assert np.all(np.asarray(m)[~mask] == 0) and np.all(np.asarray(a)[~mask] == 0)
    for aff, (r, col), (lh, lw) in zip(affs, plan.places, plan.shapes):
        np.testing.assert_array_equal(np.asarray(m)[r, col], np.asarray(aff[0]))
        np.testing.assert_array_equal(np.asarray(a)[r + lh - 1, col + lw - 1], np.asarray(aff[1]))


def _head_outputs_2d(norm, version, pack, variables, feats, head_kw):
    head = FCOS2DHead(pack_eval=pack, norm=norm, version=version, **head_kw)
    if variables is None:
        variables = head.init(jax.random.PRNGKey(0), feats, train=False)
        # randomize norm statistics so folding is non-trivial
        variables = jax.tree_util.tree_map(
            lambda x: x + 0.05 * jnp.arange(x.size, dtype=x.dtype).reshape(x.shape) / max(x.size, 1)
            if x.ndim >= 1 else x,
            variables,
        )
    outs = head.apply(variables, feats, train=False)
    return variables, outs


@pytest.mark.parametrize("norm,version", [("BN", "v2"), ("FrozenBN", "v2"), ("FrozenBN", "v1"), ("", "v1")])
def test_fcos2d_head_packed_matches(rng, norm, version):
    shapes = [(48, 160)] + FPN_SHAPES
    feats = _feats(rng, shapes, c=32)
    kw = dict(num_classes=5, in_strides=(8, 16, 32, 64, 128), num_cls_convs=2,
              num_box_convs=2, dtype=jnp.float32)
    variables, ref = _head_outputs_2d(norm, version, False, None, feats, kw)
    _, packed = _head_outputs_2d(norm, version, True, variables, feats, kw)
    for name, a, b in zip(("logits", "reg", "ctr", "tower"), ref, packed):
        for l, (x, y) in enumerate(zip(a, b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-4,
                                       err_msg=f"{name} level {l}")


@pytest.mark.parametrize("per_level_pred", [False, True])
def test_fcos3d_head_packed_matches(rng, per_level_pred):
    shapes = [(48, 160)] + FPN_SHAPES
    feats = _feats(rng, shapes, c=32)
    kw = dict(num_classes=5, in_strides=(8, 16, 32, 64, 128),
              mean_depth_per_level=(32.0, 15.0, 8.4, 5.0, 4.7),
              std_depth_per_level=(14.7, 7.1, 4.3, 2.4, 2.6),
              num_convs=2, norm="FrozenBN", per_level_predictors=per_level_pred,
              dtype=jnp.float32)
    ref_head = FCOS3DHead(pack_eval=False, **kw)
    variables = ref_head.init(jax.random.PRNGKey(1), feats, train=False)
    ref = ref_head.apply(variables, feats, train=False)
    packed = FCOS3DHead(pack_eval=True, **kw).apply(variables, feats, train=False)
    for name, a, b in zip(("quat", "ctr", "depth", "size", "conf"), ref, packed):
        for l, (x, y) in enumerate(zip(a, b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-4,
                                       err_msg=f"{name} level {l}")


@pytest.mark.parametrize("norm", ["BN", "FrozenBN"])
def test_fcos2d_head_packed_train_matches(rng, norm):
    """pack_train: train-mode outputs, UPDATED batch stats, and parameter
    gradients all match the per-level path (live BN batch statistics are
    computed from the canvas slices — identical values)."""
    shapes = [(16, 16), (8, 8), (4, 4), (2, 2)]
    feats = _feats(rng, shapes, c=16)
    kw = dict(num_classes=3, in_strides=(8, 16, 32, 64), num_cls_convs=2, num_box_convs=2,
              norm=norm, dtype=jnp.float32)
    ref_head = FCOS2DHead(pack_eval=False, pack_train=False, **kw)
    pk_head = FCOS2DHead(pack_eval=True, pack_train=True, **kw)
    variables = ref_head.init(jax.random.PRNGKey(0), feats, train=True)

    def loss(v, head):
        outs, mut = head.apply(v, feats, train=True, mutable=["batch_stats"])
        flat = sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(outs))
        return flat, (outs, mut)

    (l_ref, (out_ref, mut_ref)), g_ref = jax.value_and_grad(loss, has_aux=True)(variables, ref_head)
    (l_pk, (out_pk, mut_pk)), g_pk = jax.value_and_grad(loss, has_aux=True)(variables, pk_head)

    np.testing.assert_allclose(float(l_ref), float(l_pk), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves((out_ref, mut_ref)),
                    jax.tree_util.tree_leaves((out_pk, mut_pk))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref), jax.tree_util.tree_leaves_with_path(g_pk)
    ):
        a, b = np.asarray(a), np.asarray(b)
        # conv-backward reduction reordering noise scales with the TENSOR's
        # magnitude, so small elements need an atol proportional to it.
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5 * max(np.abs(a).max(), 1.0),
                                   err_msg=str(pa))


def test_fcos3d_head_packed_train_matches(rng):
    shapes = [(16, 16), (8, 8), (4, 4), (2, 2)]
    feats = _feats(rng, shapes, c=16)
    kw = dict(num_classes=3, in_strides=(8, 16, 32, 64),
              mean_depth_per_level=(32.0, 15.0, 8.4, 5.0),
              std_depth_per_level=(14.7, 7.1, 4.3, 2.4),
              num_convs=2, norm="BN", dtype=jnp.float32)
    ref_head = FCOS3DHead(pack_train=False, **kw)
    pk_head = FCOS3DHead(pack_train=True, **kw)
    variables = ref_head.init(jax.random.PRNGKey(1), feats, train=True)

    def loss(v, head):
        outs, mut = head.apply(v, feats, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(outs)), (outs, mut)

    (l_ref, (out_ref, mut_ref)), g_ref = jax.value_and_grad(loss, has_aux=True)(variables, ref_head)
    (l_pk, (out_pk, mut_pk)), g_pk = jax.value_and_grad(loss, has_aux=True)(variables, pk_head)
    np.testing.assert_allclose(float(l_ref), float(l_pk), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves((out_ref, mut_ref, g_ref)),
                    jax.tree_util.tree_leaves((out_pk, mut_pk, g_pk))):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5 * max(np.abs(a).max(), 1.0))


def test_train_step_packed_heads_matches():
    """One full jitted train step (shrunk model): PACKED_HEADS_TRAIN on/off
    must produce the same losses and the same updated params."""
    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.models import build_model
    from dd3d_tpu.training.train_loop import create_train_state
    from dd3d_tpu.training.train_step import make_train_step
    from test_train_step import _tiny_batch

    def run(packed):
        cfg = get_experiment_cfg("dd3d_kitti_dla34")
        cfg.FE.BACKBONE.NAME = "DLA-46-C"
        cfg.FE.BUILDER = "build_fcos_dla_fpn_backbone_p6"
        cfg.FE.OUT_FEATURES = ["p3", "p4", "p5", "p6"]
        cfg.FE.FPN.OUT_CHANNELS = 64
        cfg.DD3D.FCOS2D.NUM_CLS_CONVS = 1
        cfg.DD3D.FCOS2D.NUM_BOX_CONVS = 1
        cfg.DD3D.FCOS3D.NUM_CONVS = 1
        cfg.TPU.S2D_STEM = False
        cfg.TPU.PACKED_HEADS_TRAIN = packed
        model = build_model(cfg)
        batch = _tiny_batch(2)
        state = create_train_state(cfg, model, batch)
        step_fn = jax.jit(make_train_step(cfg, model))
        state, metrics = step_fn(state, batch)
        return jax.device_get(state.params), {k: float(v) for k, v in jax.device_get(metrics).items()}

    p_ref, m_ref = run(False)
    p_pk, m_pk = run(True)
    for k in m_ref:
        np.testing.assert_allclose(m_ref[k], m_pk[k], rtol=2e-3, atol=1e-4, err_msg=k)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(p_ref), jax.tree_util.tree_leaves_with_path(p_pk)
    ):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4 * max(np.abs(a).max(), 1.0),
                                   err_msg=str(path))


def test_nuscenes_attr_speed_packed_matches(rng):
    """NuscenesDD3D attr/speed predictors: packed vs per-level equality
    (shrunk nuScenes model, eval mode)."""
    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.models import build_model

    x = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32) * 255)

    def run(packed, variables=None):
        cfg = get_experiment_cfg("dd3d_nusc_dla34")
        cfg.FE.BACKBONE.NAME = "DLA-46-C"
        cfg.DD3D.FCOS2D.NUM_CLS_CONVS = 1
        cfg.DD3D.FCOS2D.NUM_BOX_CONVS = 1
        cfg.DD3D.FCOS3D.NUM_CONVS = 1
        cfg.TPU.S2D_STEM = False
        cfg.TPU.COMPUTE_DTYPE = "float32"
        cfg.TPU.PACKED_HEADS = packed
        model = build_model(cfg)
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), x, train=False)
        return variables, model.apply(variables, x, train=False)

    variables, out_ref = run(False)
    _, out_pk = run(True, variables)
    for k in ("attr_logits", "speed"):
        for l, (a, b) in enumerate(zip(out_ref[k], out_pk[k])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-4,
                                       err_msg=f"{k} level {l}")


def test_fcos2d_head_packed_train_mode_unchanged(rng):
    """pack_eval must not alter the TRAIN graph (live BN per level)."""
    shapes = [(16, 16), (8, 8), (4, 4)]
    feats = _feats(rng, shapes, c=16)
    kw = dict(num_classes=3, in_strides=(8, 16, 32), num_cls_convs=1, num_box_convs=1,
              norm="BN", dtype=jnp.float32)
    ref_head = FCOS2DHead(pack_eval=False, **kw)
    variables = ref_head.init(jax.random.PRNGKey(0), feats, train=True)
    ref, mut_a = ref_head.apply(variables, feats, train=True, mutable=["batch_stats"])
    packed, mut_b = FCOS2DHead(pack_eval=True, **kw).apply(
        variables, feats, train=True, mutable=["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves((ref, mut_a)), jax.tree_util.tree_leaves((packed, mut_b))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
