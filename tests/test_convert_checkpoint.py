import numpy as np
import jax
import jax.numpy as jnp
import flax

from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.models import build_model
from dd3d_tpu.utils.convert_checkpoint import convert_torch_state_dict


def test_converter_places_reference_keys():
    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False)

    rng = np.random.RandomState(0)

    # Representative reference-named tensors (detectron2/tridet conventions),
    # with reference (O, I, kH, kW) conv layouts.
    sd = {
        "backbone.bottom_up.base_layer.weight": rng.randn(16, 3, 7, 7).astype(np.float32),
        "backbone.bottom_up.base_layer.norm.weight": rng.randn(16).astype(np.float32),
        "backbone.bottom_up.base_layer.norm.running_mean": rng.randn(16).astype(np.float32),
        "backbone.bottom_up.base_layer.norm.running_var": np.abs(rng.randn(16)).astype(np.float32),
        "backbone.bottom_up.base_layer.norm.num_batches_tracked": np.asarray(100),
        "backbone.bottom_up.level0.0.weight": rng.randn(16, 16, 3, 3).astype(np.float32),
        "backbone.bottom_up.level1.0.weight": rng.randn(32, 16, 3, 3).astype(np.float32),
        "backbone.bottom_up.level2.tree1.conv1.weight": rng.randn(64, 32, 3, 3).astype(np.float32),
        "backbone.bottom_up.level2.root.conv.weight": rng.randn(64, 128, 1, 1).astype(np.float32),
        "backbone.bottom_up.level2.project.weight": rng.randn(64, 32, 1, 1).astype(np.float32),
        "backbone.bottom_up.level3.tree2.tree1.conv2.weight": rng.randn(128, 128, 3, 3).astype(np.float32),
        "backbone.fpn_lateral3.weight": rng.randn(256, 128, 1, 1).astype(np.float32),
        "backbone.fpn_output5.weight": rng.randn(256, 256, 3, 3).astype(np.float32),
        "backbone.top_block.p6.weight": rng.randn(256, 256, 3, 3).astype(np.float32),
        "backbone.top_block.p6.bias": rng.randn(256).astype(np.float32),
        "backbone.top_block.p7.weight": rng.randn(256, 256, 3, 3).astype(np.float32),
        "fcos2d_head.cls_tower.0.weight": rng.randn(256, 256, 3, 3).astype(np.float32),
        "fcos2d_head.cls_tower.0.norm.0.weight": rng.randn(256).astype(np.float32),
        "fcos2d_head.cls_tower.0.norm.4.running_var": np.abs(rng.randn(256)).astype(np.float32),
        "fcos2d_head.cls_logits.weight": rng.randn(5, 256, 3, 3).astype(np.float32),
        "fcos2d_head.cls_logits.bias": rng.randn(5).astype(np.float32),
        "fcos2d_head.scales_box2d_reg.0.scale": np.asarray([8.0], np.float32),
        "fcos3d_head.box3d_tower.2.weight": rng.randn(256, 256, 3, 3).astype(np.float32),
        "fcos3d_head.box3d_tower.2.norm.1.running_mean": rng.randn(256).astype(np.float32),
        "fcos3d_head.box3d_quat.0.weight": rng.randn(20, 256, 3, 3).astype(np.float32),
        "fcos3d_head.box3d_depth.0.weight": rng.randn(5, 256, 3, 3).astype(np.float32),
        "fcos3d_head.scales_depth.0.scale": np.asarray([4.4], np.float32),
        "fcos3d_head.offsets_depth.3.bias": np.asarray([5.0], np.float32),
        "pixel_mean": np.zeros(3, np.float32),
    }

    params, batch_stats = convert_torch_state_dict(sd, variables, strict=False)

    fp = flax.traverse_util.flatten_dict(params)
    fb = flax.traverse_util.flatten_dict(batch_stats)

    def P(*keys):
        return np.asarray(fp[keys])

    def B(*keys):
        return np.asarray(fb[keys])

    # conv transposition: (O, I, kH, kW) -> (kH, kW, I, O)
    np.testing.assert_allclose(
        P("backbone", "bottom_up", "base_layer", "conv", "kernel"),
        sd["backbone.bottom_up.base_layer.weight"].transpose(2, 3, 1, 0),
    )
    # FrozenBN trunk -> batch_stats (experiment sets FE norm FrozenBN)
    np.testing.assert_allclose(
        B("backbone", "bottom_up", "base_layer", "norm", "scale"),
        sd["backbone.bottom_up.base_layer.norm.weight"],
    )
    np.testing.assert_allclose(
        B("backbone", "bottom_up", "base_layer", "norm", "var"),
        sd["backbone.bottom_up.base_layer.norm.running_var"],
    )
    np.testing.assert_allclose(
        P("backbone", "bottom_up", "level0_conv0", "conv", "kernel"),
        sd["backbone.bottom_up.level0.0.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        P("backbone", "bottom_up", "level2", "root", "conv", "conv", "kernel"),
        sd["backbone.bottom_up.level2.root.conv.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        P("backbone", "bottom_up", "level3", "tree2", "tree1", "conv2", "conv", "kernel"),
        sd["backbone.bottom_up.level3.tree2.tree1.conv2.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        P("backbone", "fpn_lateral_level3", "conv", "kernel"),
        sd["backbone.fpn_lateral3.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        P("backbone", "top_p6", "kernel"), sd["backbone.top_block.p6.weight"].transpose(2, 3, 1, 0)
    )
    np.testing.assert_allclose(
        P("fcos2d_head", "cls_tower_conv0", "kernel"),
        sd["fcos2d_head.cls_tower.0.weight"].transpose(2, 3, 1, 0),
    )
    # per-level BN of the shared tower (ModuleListDial -> norm{lvl})
    np.testing.assert_allclose(
        P("fcos2d_head", "cls_tower_norm0", "norm0", "scale"), sd["fcos2d_head.cls_tower.0.norm.0.weight"]
    )
    np.testing.assert_allclose(
        B("fcos2d_head", "cls_tower_norm0", "norm4", "var"), sd["fcos2d_head.cls_tower.0.norm.4.running_var"]
    )
    np.testing.assert_allclose(P("fcos2d_head", "cls_logits", "bias"), sd["fcos2d_head.cls_logits.bias"])
    np.testing.assert_allclose(P("fcos2d_head", "scale_box2d_reg0", "scale"), [8.0])
    # FrozenBN 3D tower -> batch_stats
    np.testing.assert_allclose(
        B("fcos3d_head", "box3d_tower_norm2", "norm1", "mean"),
        sd["fcos3d_head.box3d_tower.2.norm.1.running_mean"],
    )
    np.testing.assert_allclose(
        P("fcos3d_head", "box3d_quat0", "kernel"), sd["fcos3d_head.box3d_quat.0.weight"].transpose(2, 3, 1, 0)
    )
    np.testing.assert_allclose(P("fcos3d_head", "scale_depth0", "scale"), [4.4])
    np.testing.assert_allclose(P("fcos3d_head", "offset_depth3", "bias"), [5.0])
