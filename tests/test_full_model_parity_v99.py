"""Full-model parity for the nuScenes VoVNet flagship graph.

Same rehearsal as test_full_model_parity.py but for the second flagship
(dd3d_nusc_v99): a reference-named synthetic state dict over the
NuscenesDD3D + VoVNet-FPN(P6) graph converts with zero unmatched keys and
matches the torch forward — including the attr/speed heads and the OSA
specifics the V-19-slim tests cannot see (multi-block stages with identity
adds, eSE in EVERY block, ceil-mode stage pooling).

Uses the V-39-eSE preset (block_per_stage [1, 1, 2, 2]) to keep compile time
sane; V-99 differs only in block counts, exercising identical code paths.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.models import build_model
from dd3d_tpu.models.vovnet import VOVNET_SPECS
from dd3d_tpu.utils.convert_checkpoint import convert_torch_state_dict

from tests.torch_ref_dd3d import TorchNuscenesVoVNetDD3D, randomize_state


@pytest.fixture(scope="module")
def nusc_cfg():
    cfg = get_experiment_cfg("dd3d_nusc_v99")
    cfg.FE.BACKBONE.NAME = "V-39-eSE"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


@pytest.fixture(scope="module")
def torch_model_and_sd(nusc_cfg):
    tm = TorchNuscenesVoVNetDD3D(
        VOVNET_SPECS["V-39-eSE"],
        num_classes=nusc_cfg.DD3D.NUM_CLASSES,
        mean_depth=tuple(nusc_cfg.DD3D.FCOS3D.MEAN_DEPTH_PER_LEVEL),
        std_depth=tuple(nusc_cfg.DD3D.FCOS3D.STD_DEPTH_PER_LEVEL),
        max_attr=nusc_cfg.DD3D.NUSC.MAX_NUM_ATTRIBUTES,
    )
    randomize_state(tm, seed=11)
    tm.eval()
    sd = {k: v.numpy().copy() for k, v in tm.state_dict().items()}
    return tm, sd


@pytest.mark.slow
def test_v99_nusc_full_model_parity(nusc_cfg, torch_model_and_sd):
    tm, sd = torch_model_and_sd

    # synthetic checkpoint must cover the graph's distinguishing tensors
    keys = set(sd)
    for pattern in (
        "backbone.bottom_up.stem.stem_1/conv.weight",
        "backbone.bottom_up.stage2.OSA2_1.layers.0.OSA2_1_0/conv.weight",
        "backbone.bottom_up.stage2.OSA2_1.ese.fc.weight",
        "backbone.bottom_up.stage4.OSA4_2.ese.fc.bias",  # eSE in NON-last... every block
        "backbone.bottom_up.stage4.OSA4_1.ese.fc.weight",
        "backbone.bottom_up.stage5.OSA5_2.concat.OSA5_2_concat/norm.running_var",
        "backbone.fpn_lateral3.weight",
        "backbone.top_block.p6.bias",
        "attr_logits.weight",
        "speed.bias",
    ):
        assert any(pattern in k for k in keys), f"synthetic .pth missing {pattern!r}"

    model = build_model(nusc_cfg)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 192, 3))
    )
    params, batch_stats = convert_torch_state_dict(sd, variables, strict=True)
    variables = {"params": params, "batch_stats": batch_stats}

    rng = np.random.RandomState(5)
    image = (rng.rand(1, 128, 192, 3) * 255).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(image.transpose(0, 3, 1, 2)))
    j_out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, jnp.asarray(image))

    for key in ("logits", "box2d_reg", "centerness", "quat", "proj_ctr", "depth",
                "size", "conf", "attr_logits", "speed"):
        assert key in j_out, key
        assert len(j_out[key]) == 4, key  # P3..P6
        for lvl, (tv, jv) in enumerate(zip(t_out[key], j_out[key])):
            t_np = tv.numpy().transpose(0, 2, 3, 1)
            j_np = np.asarray(jv, dtype=np.float32)
            np.testing.assert_allclose(
                j_np, t_np, atol=2e-3, rtol=2e-3,
                err_msg=f"{key} level {lvl} diverges",
            )
