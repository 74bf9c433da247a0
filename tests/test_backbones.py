import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dd3d_tpu.configs import get_cfg
from dd3d_tpu.models import build_feature_extractor


# Each case is a full backbone+FPN compile (~30 s CPU); only the flagship
# KITTI configuration stays in the fast suite, the other variants are `slow`.
@pytest.mark.parametrize(
    "builder,backbone,out_feats,expected_levels",
    [
        ("build_fcos_dla_fpn_backbone_p67", "DLA-34", ["level3", "level4", "level5"], ["p3", "p4", "p5", "p6", "p7"]),
        pytest.param("build_fcos_dla_fpn_backbone_p6", "DLA-46-C", ["level3", "level4", "level5"],
                     ["p3", "p4", "p5", "p6"], marks=pytest.mark.slow),
        pytest.param("build_fcos_vovnet_fpn_backbone_p6", "V-19-slim-eSE", ["stage3", "stage4", "stage5"],
                     ["p3", "p4", "p5", "p6"], marks=pytest.mark.slow),
        pytest.param("build_fcos_vovnet_fpn_backbone_p6", "V-19-slim-dw-eSE", ["stage3", "stage4", "stage5"],
                     ["p3", "p4", "p5", "p6"], marks=pytest.mark.slow),
    ],
)
def test_backbone_variants(builder, backbone, out_feats, expected_levels):
    cfg = get_cfg()
    cfg.FE.BUILDER = builder
    cfg.FE.BACKBONE.NAME = backbone
    cfg.FE.BACKBONE.OUT_FEATURES = out_feats
    cfg.FE.FPN.IN_FEATURES = out_feats

    model = build_feature_extractor(cfg)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)

    assert sorted(out.keys()) == sorted(expected_levels)
    for name in expected_levels:
        stride = 2 ** int(name[1:])
        assert out[name].shape == (1, 128 // stride, 128 // stride, 256), name
