"""Equivalence oracle for the space-to-depth DLA stem (models/s2d.py).

The s2d stem must be an EXACT rewrite: same param tree, same outputs (up to
dtype rounding) in both eval and train mode, and the same BatchNorm batch
statistics — so a checkpoint trained either way is interchangeable.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dd3d_tpu.models.dla import DLA, BasicBlock


def _models(norm="BN", dtype=jnp.float32, fold=False, base4=False):
    kw = dict(
        levels=[1, 1, 1, 2, 2, 1],
        channels=[16, 32, 64, 128, 256, 512],
        block=BasicBlock,
        out_features=("level0", "level1", "level3", "level4", "level5"),
        norm=norm,
        dtype=dtype,
    )
    return DLA(s2d_stem=False, **kw), DLA(s2d_stem=True, s2d_fold=fold, s2d_base4=base4, **kw)


def test_s2d_param_tree_identical():
    plain, s2d = _models()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vp = jax.eval_shape(lambda: plain.init(jax.random.PRNGKey(0), x, train=False))
    vs = jax.eval_shape(lambda: s2d.init(jax.random.PRNGKey(0), x, train=False))
    flat_p = {"/".join(p): v.shape for p, v in jax.tree_util.tree_flatten_with_path(vp)[0] for p in [[str(k.key) for k in p]]}
    flat_s = {"/".join(p): v.shape for p, v in jax.tree_util.tree_flatten_with_path(vs)[0] for p in [[str(k.key) for k in p]]}
    assert flat_p == flat_s


def test_s2d4_to_s2d2_property(rng):
    """s2d4_to_s2d2(space_to_depth(x, 4)) == space_to_depth(x, 2)."""
    from dd3d_tpu.models.s2d import s2d4_to_s2d2, space_to_depth

    x = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(s2d4_to_s2d2(space_to_depth(x, 4))),
        np.asarray(space_to_depth(x, 2)),
    )


@pytest.mark.slow
@pytest.mark.parametrize("fold,base4", [(False, False), (True, False), (False, True)])
def test_s2d_stem_matches_plain_eval(rng, fold, base4):
    plain, s2d = _models(fold=fold, base4=base4)
    x = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32) * 255 - 127.0)
    variables = plain.init(jax.random.PRNGKey(3), x, train=False)
    # randomize BN stats so eval mode actually exercises them
    variables = jax.tree.map(
        lambda v: v + jnp.abs(jnp.asarray(np.random.RandomState(1).rand(*v.shape), v.dtype)) * 0.1,
        variables,
    )
    out_p = plain.apply(variables, x, train=False)
    out_s = s2d.apply(variables, x, train=False)
    assert set(out_p) == set(out_s)
    for k in out_p:
        np.testing.assert_allclose(np.asarray(out_p[k]), np.asarray(out_s[k]), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("fold,base4", [(False, False), (True, False), (False, True)])
def test_s2d_stem_matches_plain_train_and_stats(rng, fold, base4):
    plain, s2d = _models(fold=fold, base4=base4)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32) * 255 - 127.0)
    variables = plain.init(jax.random.PRNGKey(3), x, train=False)
    out_p, mut_p = plain.apply(variables, x, train=True, mutable=["batch_stats"])
    out_s, mut_s = s2d.apply(variables, x, train=True, mutable=["batch_stats"])
    for k in out_p:
        # train-mode BN reduces over a different fp32 summation order
        # ((B,H,W) vs (N, phase)); tiny stat differences amplify through the
        # normalization, so the tolerance is looser than eval's.
        np.testing.assert_allclose(np.asarray(out_p[k]), np.asarray(out_s[k]), rtol=1e-2, atol=1e-3)
    # the stem BN running stats must update identically
    for name in ("base_layer", "level0_conv0", "level1_conv0"):
        for stat in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mut_p["batch_stats"][name]["norm"][stat]),
                np.asarray(mut_s["batch_stats"][name]["norm"][stat]),
                rtol=1e-4, atol=1e-5,
                err_msg=f"{name}/{stat}",
            )


@pytest.mark.slow
def test_s2d_stem_matches_plain_frozenbn(rng):
    plain, s2d = _models(norm="FrozenBN")
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 10)
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)
    out_p = plain.apply(variables, x, train=False)
    out_s = s2d.apply(variables, x, train=False)
    for k in out_p:
        np.testing.assert_allclose(np.asarray(out_p[k]), np.asarray(out_s[k]), rtol=1e-4, atol=1e-4)


def test_s2d_stem_train_mode_value(rng):
    """s2d_stem="train": the eval graph is the plain stem (bitwise equal),
    the train graph is the s2d stem (bitwise equal to s2d_stem=True), and
    one parameter tree serves both."""
    from dd3d_tpu.models.dla import DLA

    kw = dict(levels=[1, 1, 1, 2, 2, 1], channels=[16, 32, 64, 128, 256, 512],
              block=BasicBlock, out_features=("level3", "level4", "level5"),
              norm="FrozenBN", dtype=jnp.float32)
    plain = DLA(s2d_stem=False, **kw)
    s2d = DLA(s2d_stem=True, **kw)
    hybrid = DLA(s2d_stem="train", **kw)

    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 255 - 127)
    variables = plain.init(jax.random.PRNGKey(0), x, train=False)

    out_h = hybrid.apply(variables, x, train=False)
    out_p = plain.apply(variables, x, train=False)
    for k in out_p:
        np.testing.assert_array_equal(np.asarray(out_h[k]), np.asarray(out_p[k]))

    out_ht = hybrid.apply(variables, x, train=True)
    out_st = s2d.apply(variables, x, train=True)
    for k in out_st:
        np.testing.assert_array_equal(np.asarray(out_ht[k]), np.asarray(out_st[k]))


def test_s2d_fold_gradients_match_unfolded(rng):
    """The batch-folded stem exists for the BACKWARD pass (dW layouts); its
    gradient must equal the unfolded path's as a FUNCTION.

    Compared in float64: the live-BN backward under a sum-of-squares loss
    is ill-conditioned in f32 (BN output is scale-invariant in the conv
    kernel, so kernel-gradient terms nearly cancel — measured ~0.2 relmax
    of pure f32 rounding noise against an f64 oracle for BOTH paths), so
    an f32-vs-f32 comparison only measures that noise. In f64 the two
    formulations agree to ~1e-10, proving the rescaled-stats fold gradient
    is the same mathematical function."""
    from jax import enable_x64
    from dd3d_tpu.models.s2d import (
        S2DConvNorm, space_to_depth, fold_batch_rows, fold_row_mask,
        unfold_batch_rows,
    )

    with enable_x64():
        B, H, W = 3, 16, 24
        x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float64)) * 10 - 5
        xs = space_to_depth(x, 2)
        hs, G = H // 2, 4
        mod_plain = S2DConvNorm(16, 7, mode="s1", norm="BN", dtype=jnp.float64)
        mod_fold = S2DConvNorm(
            16, 7, mode="s1", norm="BN", dtype=jnp.float64, valid_frac=hs / (hs + G)
        )
        v = mod_plain.init(jax.random.PRNGKey(0), xs, train=False)
        v = jax.tree.map(lambda a: a.astype(jnp.float64), v)
        mask = fold_row_mask(B, hs, G)
        xf = fold_batch_rows(xs, G)

        def loss_plain(params):
            y, _ = mod_plain.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                xs, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(jnp.square(y))

        def loss_fold(params):
            y, _ = mod_fold.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                xf, train=True, row_mask=mask, mutable=["batch_stats"],
            )
            return jnp.sum(jnp.square(unfold_batch_rows(y, B, G)))

        np.testing.assert_allclose(
            float(loss_plain(v["params"])), float(loss_fold(v["params"])), rtol=1e-9
        )
        gp = jax.grad(loss_plain)(v["params"])
        gf = jax.grad(loss_fold)(v["params"])
        for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(gp)[0], jax.tree_util.tree_leaves(gf)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9,
                err_msg="/".join(str(k.key) for k in path),
            )


def test_s2d_fold_roundtrip():
    """fold/unfold are exact inverses; the row mask marks image rows."""
    from dd3d_tpu.models.s2d import fold_batch_rows, fold_row_mask, unfold_batch_rows

    x = jnp.asarray(np.random.RandomState(0).rand(3, 8, 5, 2).astype(np.float32))
    f = fold_batch_rows(x, 4)
    assert f.shape == (1, 3 * 12, 5, 2)
    np.testing.assert_array_equal(np.asarray(unfold_batch_rows(f, 3, 4)), np.asarray(x))
    m = fold_row_mask(3, 8, 4)
    assert m.shape == (1, 36, 1, 1)
    # masked canvas == canvas (guards already zero)
    np.testing.assert_array_equal(np.asarray(f * m), np.asarray(f))
    # mask zeroes exactly the guard rows
    assert float(m.sum()) == 3 * 8


def test_s2d_cli_coercion():
    from dd3d_tpu.models.dla import _coerce_s2d

    assert _coerce_s2d("train") == "train"
    assert _coerce_s2d("True") is True
    assert _coerce_s2d("false") is False
    assert _coerce_s2d(True) is True
    assert _coerce_s2d(False) is False


def test_pallas_dw_stem_gradients_match(rng):
    """TPU.PALLAS_STEM_DW routes the s1 stem convs through the Pallas
    weight-gradient kernel (ops/pallas_conv.py, interpret mode off-TPU):
    forward outputs are identical and the FULL stem gradient matches the
    XLA path in f32 to tight tolerance (same accumulation dtypes)."""
    kw = dict(
        levels=[1, 1, 1, 2, 2, 1],
        channels=[16, 32, 64, 128, 256, 512],
        block=BasicBlock,
        out_features=("level1",),
        norm="BN",
        dtype=jnp.float32,
    )
    m_xla = DLA(s2d_stem=True, **kw)
    m_pal = DLA(s2d_stem=True, pallas_stem_dw=True, **kw)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32)) * 10 - 5
    v = m_xla.init(jax.random.PRNGKey(0), x, train=True)

    def loss(m, params):
        out, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x, train=True,
            mutable=["batch_stats"],
        )
        return jnp.sum(out["level1"].astype(jnp.float32) ** 2)

    la, ga = jax.value_and_grad(lambda p: loss(m_xla, p))(v["params"])
    lb, gb = jax.value_and_grad(lambda p: loss(m_pal, p))(v["params"])
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    flat_a = {"/".join(str(k.key) for k in p): g for p, g in jax.tree_util.tree_flatten_with_path(ga)[0]}
    flat_b = {"/".join(str(k.key) for k in p): g for p, g in jax.tree_util.tree_flatten_with_path(gb)[0]}
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        a, b = np.asarray(flat_a[k]), np.asarray(flat_b[k])
        scale = max(np.max(np.abs(a)), 1e-6)
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-3, err_msg=k)
