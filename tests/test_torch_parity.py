"""Golden-value parity vs PyTorch (CPU): the layer semantics that checkpoint
conversion relies on — conv padding/layout, BatchNorm eval statistics — must
match torch exactly (SURVEY.md §4 'golden-value tests' strategy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from flax import linen as nn


def test_conv3x3_matches_torch(rng):
    x = rng.randn(2, 16, 20, 8).astype(np.float32)  # NHWC
    w = rng.randn(12, 8, 3, 3).astype(np.float32)  # torch OIHW
    b = rng.randn(12).astype(np.float32)

    with torch.no_grad():
        tconv = torch.nn.Conv2d(8, 12, 3, padding=1)
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
        ty = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    conv = nn.Conv(12, (3, 3), padding=1, dtype=jnp.float32)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}}
    jy = np.asarray(conv.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(jy, ty, atol=2e-5)


def test_strided_conv_matches_torch(rng):
    """Stride-2 3x3 with padding 1 — the downsampling convs of DLA/FPN tops."""
    x = rng.randn(1, 16, 16, 4).astype(np.float32)
    w = rng.randn(6, 4, 3, 3).astype(np.float32)
    with torch.no_grad():
        tconv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1, bias=False)
        tconv.weight.copy_(torch.from_numpy(w))
        ty = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    conv = nn.Conv(6, (3, 3), strides=2, padding=1, use_bias=False, dtype=jnp.float32)
    jy = np.asarray(conv.apply({"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}, jnp.asarray(x)))
    np.testing.assert_allclose(jy, ty, atol=2e-5)


def test_batchnorm_eval_matches_torch(rng):
    x = rng.randn(2, 8, 8, 10).astype(np.float32)
    gamma = rng.rand(10).astype(np.float32) + 0.5
    beta = rng.randn(10).astype(np.float32)
    mean = rng.randn(10).astype(np.float32)
    var = rng.rand(10).astype(np.float32) + 0.2

    with torch.no_grad():
        tbn = torch.nn.BatchNorm2d(10, eps=1e-5)
        tbn.weight.copy_(torch.from_numpy(gamma))
        tbn.bias.copy_(torch.from_numpy(beta))
        tbn.running_mean.copy_(torch.from_numpy(mean))
        tbn.running_var.copy_(torch.from_numpy(var))
        tbn.eval()
        ty = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    bn = nn.BatchNorm(use_running_average=True, epsilon=1e-5, dtype=jnp.float32)
    variables = {
        "params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    jy = np.asarray(bn.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(jy, ty, atol=2e-5)

    # FrozenBN must agree with torch eval-mode BN too.
    from dd3d_tpu.models.layers import FrozenBatchNorm

    fbn = FrozenBatchNorm(features=10, dtype=jnp.float32)
    fvars = {"batch_stats": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta),
                             "mean": jnp.asarray(mean), "var": jnp.asarray(var)}}
    fy = np.asarray(fbn.apply(fvars, jnp.asarray(x)))
    np.testing.assert_allclose(fy, ty, atol=2e-5)


def test_basicblock_matches_torch(rng):
    """Full DLA BasicBlock (conv-bn-relu-conv-bn-add-relu) with converted
    weights — end-to-end layer-stack parity."""
    from dd3d_tpu.models.dla import BasicBlock

    c = 8
    x = rng.randn(1, 12, 12, c).astype(np.float32)
    w1 = rng.randn(c, c, 3, 3).astype(np.float32) * 0.3
    w2 = rng.randn(c, c, 3, 3).astype(np.float32) * 0.3
    stats = [
        dict(gamma=rng.rand(c).astype(np.float32) + 0.5, beta=rng.randn(c).astype(np.float32),
             mean=rng.randn(c).astype(np.float32) * 0.1, var=rng.rand(c).astype(np.float32) + 0.5)
        for _ in range(2)
    ]

    class TorchBlock(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = torch.nn.Conv2d(c, c, 3, padding=1, bias=False)
            self.b1 = torch.nn.BatchNorm2d(c)
            self.c2 = torch.nn.Conv2d(c, c, 3, padding=1, bias=False)
            self.b2 = torch.nn.BatchNorm2d(c)

        def forward(self, x):
            out = torch.relu(self.b1(self.c1(x)))
            out = self.b2(self.c2(out))
            return torch.relu(out + x)

    with torch.no_grad():
        tb = TorchBlock()
        tb.c1.weight.copy_(torch.from_numpy(w1))
        tb.c2.weight.copy_(torch.from_numpy(w2))
        for bn, s in zip([tb.b1, tb.b2], stats):
            bn.weight.copy_(torch.from_numpy(s["gamma"]))
            bn.bias.copy_(torch.from_numpy(s["beta"]))
            bn.running_mean.copy_(torch.from_numpy(s["mean"]))
            bn.running_var.copy_(torch.from_numpy(s["var"]))
        tb.eval()
        ty = tb(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    block = BasicBlock(planes=c, norm="BN", dtype=jnp.float32)
    variables = {
        "params": {
            "conv1": {"conv": {"kernel": jnp.asarray(w1.transpose(2, 3, 1, 0))},
                      "norm": {"scale": jnp.asarray(stats[0]["gamma"]), "bias": jnp.asarray(stats[0]["beta"])}},
            "conv2": {"conv": {"kernel": jnp.asarray(w2.transpose(2, 3, 1, 0))},
                      "norm": {"scale": jnp.asarray(stats[1]["gamma"]), "bias": jnp.asarray(stats[1]["beta"])}},
        },
        "batch_stats": {
            "conv1": {"norm": {"mean": jnp.asarray(stats[0]["mean"]), "var": jnp.asarray(stats[0]["var"])}},
            "conv2": {"norm": {"mean": jnp.asarray(stats[1]["mean"]), "var": jnp.asarray(stats[1]["var"])}},
        },
    }
    jy = np.asarray(block.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(jy, ty, atol=3e-5)
