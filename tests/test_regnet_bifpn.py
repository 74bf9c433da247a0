"""RegNetY + BiFPN — the reference's dead `regnety_006_bifpn` config, live.

Covers: RegNet width-generation recipe against the published RegNetY model
table, feature-extractor shapes/strides, the full DD3D meta-arch forward on
the `dd3d_kitti_regnety_006_bifpn` experiment, and a train-mode gradient
smoke (BiFPN fusion weights + SE must receive gradients).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.models import build_feature_extractor, build_model
from dd3d_tpu.models.regnet import REGNETY_SPECS, generate_regnet_params


def test_regnet_width_generation_matches_published():
    """The (w0, wa, wm, depth) recipe must reproduce the published per-stage
    widths/depths (Radosavovic et al. Table; same values as pycls/timm)."""
    w0, wa, wm, d, g, _ = REGNETY_SPECS["RegNetY-006"]
    widths, depths, gws = generate_regnet_params(w0, wa, wm, d, g)
    assert widths == (48, 112, 256, 608)
    assert depths == (1, 3, 7, 4)
    assert gws == (16, 16, 16, 16)

    w0, wa, wm, d, g, _ = REGNETY_SPECS["RegNetY-004"]
    widths, depths, _ = generate_regnet_params(w0, wa, wm, d, g)
    assert widths == (48, 104, 208, 440)
    assert depths == (1, 3, 6, 6)


@pytest.mark.slow
def test_regnety_bifpn_feature_extractor_shapes():
    cfg = get_experiment_cfg("dd3d_kitti_regnety_006_bifpn")
    cfg.TPU.COMPUTE_DTYPE = "float32"
    fe = build_feature_extractor(cfg)
    assert fe.out_features == ("p3", "p4", "p5", "p6", "p7")
    assert fe.out_feature_strides == {"p3": 8, "p4": 16, "p5": 32, "p6": 64, "p7": 128}
    assert fe.size_divisibility == 128

    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = fe.init(jax.random.PRNGKey(0), x, train=False)
    out = fe.apply(variables, x, train=False)
    c = cfg.FE.BIFPN.OUT_CHANNELS
    for name in fe.out_features:
        s = fe.out_feature_strides[name]
        assert out[name].shape == (1, 128 // s, 128 // s, c), name


@pytest.mark.slow
def test_regnety_bifpn_dd3d_forward_and_grad():
    """Full DD3D meta-arch on the regnety experiment: forward shapes + a
    train-mode gradient step reaching the BiFPN fusion weights and SE."""
    cfg = get_experiment_cfg("dd3d_kitti_regnety_006_bifpn")
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.S2D_STEM = False
    model = build_model(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32) * 255)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert len(out["logits"]) == 5
    assert out["logits"][0].shape == (1, 16, 16, cfg.DD3D.NUM_CLASSES)

    def loss(params):
        o, _ = model.apply(
            {**variables, "params": params}, x, train=True, mutable=["batch_stats"]
        )
        return sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in jax.tree_util.tree_leaves(o))

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(g)
    # fusion weights and SE convs got gradients
    fuse = [np.abs(np.asarray(v)).sum() for p, v in flat if "_w" in str(p)]
    se = [np.abs(np.asarray(v)).sum() for p, v in flat if "se" in str(p).lower() and "kernel" in str(p)]
    assert fuse and any(f > 0 for f in fuse)
    assert se and any(s > 0 for s in se)
    assert all(np.all(np.isfinite(np.asarray(v))) for _, v in flat)
