import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax

from dd3d_tpu.configs import get_cfg
from dd3d_tpu.models import build_feature_extractor
from dd3d_tpu.utils.convert_checkpoint import convert_torch_state_dict


@pytest.mark.slow
def test_vovnet_name_translation():
    cfg = get_cfg()
    cfg.FE.BUILDER = "build_fcos_vovnet_fpn_backbone_p6"
    cfg.FE.BACKBONE.NAME = "V-19-slim-eSE"
    cfg.FE.BACKBONE.OUT_FEATURES = ["stage3", "stage4", "stage5"]
    cfg.FE.FPN.IN_FEATURES = ["stage3", "stage4", "stage5"]
    model = build_feature_extractor(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False)
    # wrap as a DD3D-like tree: the converter expects a 'backbone' root
    variables = {"params": {"backbone": variables["params"]},
                 "batch_stats": {"backbone": variables.get("batch_stats", {})}}

    rng = np.random.RandomState(0)
    sd = {
        "backbone.bottom_up.stem.stem_1/conv.weight": rng.randn(64, 3, 3, 3).astype(np.float32),
        "backbone.bottom_up.stem.stem_1/norm.weight": rng.randn(64).astype(np.float32),
        "backbone.bottom_up.stem.stem_3/norm.running_var": np.abs(rng.randn(128)).astype(np.float32),
        "backbone.bottom_up.stage2.OSA2_1.layers.0.OSA2_1_0/conv.weight": rng.randn(64, 128, 3, 3).astype(np.float32),
        "backbone.bottom_up.stage2.OSA2_1.layers.0.OSA2_1_0/norm.running_mean": rng.randn(64).astype(np.float32),
        "backbone.bottom_up.stage2.OSA2_1.concat.OSA2_1_concat/conv.weight": rng.randn(112, 320, 1, 1).astype(np.float32),
        "backbone.bottom_up.stage2.OSA2_1.ese.fc.weight": rng.randn(112, 112, 1, 1).astype(np.float32),
        "backbone.bottom_up.stage2.OSA2_1.ese.fc.bias": rng.randn(112).astype(np.float32),
    }
    params, batch_stats = convert_torch_state_dict(sd, variables)
    fp = flax.traverse_util.flatten_dict(params)
    fb = flax.traverse_util.flatten_dict(batch_stats)

    np.testing.assert_allclose(
        np.asarray(fp[("backbone", "bottom_up", "stem1", "conv", "kernel")]),
        sd["backbone.bottom_up.stem.stem_1/conv.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(fp[("backbone", "bottom_up", "stem1", "norm", "scale")]),
        sd["backbone.bottom_up.stem.stem_1/norm.weight"],
    )
    np.testing.assert_allclose(
        np.asarray(fb[("backbone", "bottom_up", "stem3", "norm", "var")]),
        sd["backbone.bottom_up.stem.stem_3/norm.running_var"],
    )
    np.testing.assert_allclose(
        np.asarray(fp[("backbone", "bottom_up", "OSA2_1", "layer0", "conv", "kernel")]),
        sd["backbone.bottom_up.stage2.OSA2_1.layers.0.OSA2_1_0/conv.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(fb[("backbone", "bottom_up", "OSA2_1", "layer0", "norm", "mean")]),
        sd["backbone.bottom_up.stage2.OSA2_1.layers.0.OSA2_1_0/norm.running_mean"],
    )
    np.testing.assert_allclose(
        np.asarray(fp[("backbone", "bottom_up", "OSA2_1", "concat", "conv", "kernel")]),
        sd["backbone.bottom_up.stage2.OSA2_1.concat.OSA2_1_concat/conv.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(fp[("backbone", "bottom_up", "OSA2_1", "ese", "fc", "kernel")]),
        sd["backbone.bottom_up.stage2.OSA2_1.ese.fc.weight"].transpose(2, 3, 1, 0),
    )
