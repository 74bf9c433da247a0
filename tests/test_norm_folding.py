"""FrozenBN folding (layers.FoldableConv): conv(x)*mul + add must equal
conv_{W*mul}(x) + add to dtype rounding, end-to-end through ConvNorm and the
FCOS3D tower, in both train and eval mode (FrozenBN stats never update, so
folding is mode-independent). A gradient check pins that the folded kernel
gradient equals the unfolded one (chain rule just multiplies by `mul`)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import dd3d_tpu.models.layers as L


def _rand_stats(rng, c):
    return {
        "scale": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(c).astype(np.float32)),
        "mean": jnp.asarray(rng.randn(c).astype(np.float32)),
        "var": jnp.asarray(rng.rand(c).astype(np.float32) + 0.5),
    }


@pytest.mark.parametrize("strides,dilation,groups", [(1, 1, 1), (2, 1, 1), (1, 2, 1), (1, 1, 4)])
def test_convnorm_folded_matches_unfolded(monkeypatch, strides, dilation, groups):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))

    def build_apply(fold):
        monkeypatch.setattr(L, "FOLD_FROZEN_BN", fold)
        m = L.ConvNorm(8, kernel_size=3, strides=strides, dilation=dilation, groups=groups,
                       norm="FrozenBN", dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        stats = _rand_stats(rng, 8)
        v = {"params": v["params"], "batch_stats": {"norm": stats}}
        return np.asarray(m.apply(v, x))

    rng = np.random.RandomState(0)
    a = build_apply(True)
    rng = np.random.RandomState(0)
    b = build_apply(False)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_fcos3d_tower_folded_matches_unfolded(monkeypatch):
    from dd3d_tpu.models.fcos3d import FCOS3DHead

    rng = np.random.RandomState(1)
    feats = [jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32)) for _ in range(2)]

    def run(fold):
        monkeypatch.setattr(L, "FOLD_FROZEN_BN", fold)
        head = FCOS3DHead(num_classes=3, in_strides=[8, 16], num_convs=2, norm="FrozenBN",
                          mean_depth_per_level=[10.0, 20.0], std_depth_per_level=[5.0, 5.0],
                          dtype=jnp.float32)
        v = head.init(jax.random.PRNGKey(2), feats, train=False)
        stats = jax.tree_util.tree_map(
            lambda p: jnp.asarray(np.random.RandomState(3).rand(*p.shape).astype(np.float32) + 0.5),
            v.get("batch_stats", {}),
        )
        v = {"params": v["params"], "batch_stats": stats}
        return head.apply(v, feats, train=False)

    out_f = run(True)
    out_u = run(False)
    for a, b in zip(jax.tree_util.tree_leaves(out_f), jax.tree_util.tree_leaves(out_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_folded_gradient_matches_unfolded(monkeypatch):
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))

    def grad_of(fold):
        monkeypatch.setattr(L, "FOLD_FROZEN_BN", fold)
        m = L.ConvNorm(4, kernel_size=3, norm="FrozenBN", dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(5), x)
        stats = _rand_stats(np.random.RandomState(6), 4)
        params, bs = v["params"], {"norm": stats}

        def loss(p):
            return jnp.sum(m.apply({"params": p, "batch_stats": bs}, x) ** 2)

        return jax.grad(loss)(params)

    g_f = grad_of(True)
    g_u = grad_of(False)
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_param_tree_identical_across_folding(monkeypatch):
    """Checkpoint compatibility: folding must not change the variable tree."""
    x = jnp.zeros((1, 8, 8, 8), jnp.float32)
    trees = []
    for fold in (True, False):
        monkeypatch.setattr(L, "FOLD_FROZEN_BN", fold)
        m = L.ConvNorm(8, kernel_size=3, norm="FrozenBN", dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        trees.append(jax.tree_util.tree_structure(v))
    assert trees[0] == trees[1]


def test_foldable_batchnorm_matches_flax_batchnorm():
    """FoldableBatchNorm must replicate nn.BatchNorm(momentum=0.9, eps=1e-5):
    train-mode normalize + running-stat updates and eval-mode normalize."""
    from flax import linen as nn

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(4, 6, 6, 8).astype(np.float32) * 3 + 1)

    ours = L.FoldableBatchNorm(features=8, dtype=jnp.float32)
    ref = nn.BatchNorm(use_running_average=None, momentum=0.9, epsilon=1e-5, dtype=jnp.float32)

    v_o = ours.init(jax.random.PRNGKey(0), x, use_running_average=False)
    v_r = ref.init(jax.random.PRNGKey(0), x, use_running_average=False)
    # same (non-trivial) affine params on both
    params = {"scale": jnp.asarray(rng.rand(8).astype(np.float32) + 0.5),
              "bias": jnp.asarray(rng.randn(8).astype(np.float32))}
    v_o = {"params": params, "batch_stats": v_o["batch_stats"]}
    v_r = {"params": params, "batch_stats": v_r["batch_stats"]}

    # train mode: outputs and updated running stats must match
    y_o, m_o = ours.apply(v_o, x, use_running_average=False, mutable=["batch_stats"])
    y_r, m_r = ref.apply(v_r, x, use_running_average=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_o), np.asarray(y_r), rtol=1e-5, atol=1e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(m_o["batch_stats"][k]),
                                   np.asarray(m_r["batch_stats"][k]), rtol=1e-5, atol=1e-6)

    # eval mode with the updated stats
    v_o = {"params": params, "batch_stats": m_o["batch_stats"]}
    v_r = {"params": params, "batch_stats": m_r["batch_stats"]}
    y_o = ours.apply(v_o, x, use_running_average=True)
    y_r = ref.apply(v_r, x, use_running_average=True)
    np.testing.assert_allclose(np.asarray(y_o), np.asarray(y_r), rtol=1e-5, atol=1e-5)


def test_live_bn_folds_at_eval_only(monkeypatch):
    """ConvNorm with live BN: eval-mode fold must equal the unfolded eval
    path; train mode must keep live batch statistics (folding would change
    the output there, so assert the train path is NOT the folded one)."""
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))

    def run(fold, train):
        monkeypatch.setattr(L, "FOLD_FROZEN_BN", fold)
        m = L.ConvNorm(8, kernel_size=3, norm="BN", dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(9), x, train=True)
        stats = {"norm": {"mean": jnp.asarray(rng.randn(8).astype(np.float32)),
                          "var": jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)}}
        v = {"params": v["params"], "batch_stats": stats}
        if train:
            y, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
        else:
            y = m.apply(v, x, train=False)
        return np.asarray(y)

    rng = np.random.RandomState(8)
    a = run(True, False)
    rng = np.random.RandomState(8)
    b = run(False, False)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    rng = np.random.RandomState(8)
    t_folded_cfg = run(True, True)  # fold flag on, but train => live BN
    rng = np.random.RandomState(8)
    t_ref = run(False, True)
    np.testing.assert_allclose(t_folded_cfg, t_ref, rtol=1e-5, atol=1e-5)
    assert not np.allclose(t_ref, b)  # live stats differ from running stats


def test_fcos2d_head_eval_fold_matches_unfolded(monkeypatch):
    from dd3d_tpu.models.fcos2d import FCOS2DHead

    rng = np.random.RandomState(10)
    feats = [jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32)) for _ in range(2)]

    def run(fold):
        monkeypatch.setattr(L, "FOLD_FROZEN_BN", fold)
        head = FCOS2DHead(num_classes=3, in_strides=[8, 16], dtype=jnp.float32)
        v = head.init(jax.random.PRNGKey(11), feats, train=False)
        stats = jax.tree_util.tree_map(
            lambda p: jnp.asarray(np.random.RandomState(12).rand(*p.shape).astype(np.float32) + 0.25),
            v.get("batch_stats", {}),
        )
        v = {"params": v["params"], "batch_stats": stats}
        return head.apply(v, feats, train=False)

    out_f = run(True)
    out_u = run(False)
    for a, b in zip(jax.tree_util.tree_leaves(out_f), jax.tree_util.tree_leaves(out_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
