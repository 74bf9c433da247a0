"""Training-path numeric parity vs a torch mirror of the reference
(VERDICT round-2 item 1): target assignment and EVERY loss term.

Both sides consume IDENTICAL random head outputs (arbitrary values — a
strictly stronger check than routing through the parity-proven forward) and
identical synthetic GT, so any deviation in the target preparer
(prepare_targets.py:105-235), FCOS2DLoss (fcos2d.py:159-239), FCOS3DLoss
(fcos3d.py:191-299), or NuscenesLoss (nuscenes_dd3d.py:199-265) flips these
tests. Per-location target equality is asserted exactly; loss scalars to
fp32 tolerance.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from dd3d_tpu.configs import get_experiment_cfg
from dd3d_tpu.models.dd3d import dd3d_losses
from dd3d_tpu.models.nuscenes_dd3d import nuscenes_dd3d_losses

from tests.torch_ref_losses import (
    TorchTargetPreparer,
    VisionBoxes3D,
    compute_features_locations,
    torch_fcos2d_loss,
    torch_fcos3d_loss,
    torch_nuscenes_loss,
)

STRIDES = [8, 16, 32, 64, 128]
IMG_H, IMG_W = 128, 256
MAX_GT = 5


def _feature_shapes(strides):
    return [(IMG_H // s, IMG_W // s) for s in strides]


def _synthetic_gt(rng, num_classes, with_empty_image=True, nuscenes=False, max_attr=4):
    """2-3 images; boxes sized to land on different SOI levels, one
    overlapping pair (min-area tie-break), optionally one empty image."""
    intrinsics = np.stack([
        np.array([[355.0, 0.0, 128.0], [0.0, 350.0, 64.0], [0.0, 0.0, 1.0]]),
        np.array([[420.0, 0.0, 120.0], [0.0, 430.0, 70.0], [0.0, 0.0, 1.0]]),
        np.array([[380.0, 0.0, 130.0], [0.0, 380.0, 60.0], [0.0, 0.0, 1.0]]),
    ]).astype(np.float32)

    # [x1, y1, x2, y2]: small (SOI lvl 0), medium (lvl 1-2), large (lvl 3-4),
    # plus an overlapping small box for the tie-break.
    boxes_per_image = [
        np.array([
            [40.0, 30.0, 85.0, 68.0],       # ~45 px
            [30.0, 20.0, 130.0, 110.0],     # ~100 px, overlaps the small one
            [10.0, 5.0, 250.0, 125.0],      # ~240 px
        ], dtype=np.float32),
        np.array([
            [100.0, 40.0, 150.0, 90.0],
            [60.0, 10.0, 230.0, 120.0],
        ], dtype=np.float32),
    ]
    if with_empty_image:
        boxes_per_image.append(np.zeros((0, 4), dtype=np.float32))

    gt_list = []
    B = len(boxes_per_image)
    for i, boxes in enumerate(boxes_per_image):
        n = len(boxes)
        quat = rng.randn(n, 4).astype(np.float32)
        quat /= np.maximum(np.linalg.norm(quat, axis=-1, keepdims=True), 1e-6)
        ctrs = (boxes[:, :2] + boxes[:, 2:]) / 2.0
        proj_ctr = (ctrs + rng.randn(n, 2).astype(np.float32) * 3.0).astype(np.float32)
        depth = (rng.rand(n, 1).astype(np.float32) * 35.0 + 4.0)
        size = (rng.rand(n, 3).astype(np.float32) * 2.0 + 1.0)
        classes = rng.randint(0, num_classes, size=(n,)).astype(np.int64)
        d = {
            "boxes2d": boxes, "classes": classes, "quat": quat,
            "proj_ctr": proj_ctr, "depth": depth, "size": size,
            "intrinsics": intrinsics[i],
        }
        if nuscenes:
            attrs = rng.randint(0, max_attr + 1, size=(n,)).astype(np.int64)
            speeds = (rng.rand(n).astype(np.float32) * 10.0)
            if n > 1:
                attrs[0] = max_attr  # "attr missing" row
                speeds[1] = np.nan   # NaN GT speed row
            d["attributes"] = attrs
            d["speeds"] = speeds
        gt_list.append(d)
    return gt_list, intrinsics[:B]


def _torch_gt_instances(gt_list):
    out = []
    for d in gt_list:
        n = len(d["boxes2d"])
        inv_K = np.linalg.inv(d["intrinsics"]).astype(np.float32)
        inst = {
            "boxes2d": torch.from_numpy(d["boxes2d"]),
            "classes": torch.from_numpy(d["classes"]),
            "boxes3d": VisionBoxes3D(
                torch.from_numpy(d["quat"]),
                torch.from_numpy(d["proj_ctr"]),
                torch.from_numpy(d["depth"]),
                torch.from_numpy(d["size"]),
                torch.from_numpy(np.broadcast_to(inv_K, (n, 3, 3)).copy()),
            ),
        }
        if "attributes" in d:
            inst["attributes"] = torch.from_numpy(d["attributes"])
            inst["speeds"] = torch.from_numpy(d["speeds"])
        out.append(inst)
    return out


def _jax_batch(gt_list, intrinsics, nuscenes=False):
    B = len(gt_list)
    gt_boxes2d = np.zeros((B, MAX_GT, 4), dtype=np.float32)
    gt_classes = np.zeros((B, MAX_GT), dtype=np.int32)
    gt_boxes3d = np.zeros((B, MAX_GT, 10), dtype=np.float32)
    gt_valid = np.zeros((B, MAX_GT), dtype=bool)
    gt_attrs = np.zeros((B, MAX_GT), dtype=np.int32)
    gt_speeds = np.zeros((B, MAX_GT), dtype=np.float32)
    for i, d in enumerate(gt_list):
        n = len(d["boxes2d"])
        gt_boxes2d[i, :n] = d["boxes2d"]
        gt_classes[i, :n] = d["classes"]
        gt_boxes3d[i, :n] = np.concatenate(
            [d["quat"], d["proj_ctr"], d["depth"], d["size"]], axis=-1
        )
        gt_valid[i, :n] = True
        if nuscenes:
            gt_attrs[i, :n] = d["attributes"]
            gt_speeds[i, :n] = d["speeds"]
    batch = {
        "gt_boxes2d": jnp.asarray(gt_boxes2d),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_boxes3d": jnp.asarray(gt_boxes3d),
        "gt_valid": jnp.asarray(gt_valid),
        "intrinsics": jnp.asarray(intrinsics),
    }
    if nuscenes:
        batch["gt_attributes"] = jnp.asarray(gt_attrs)
        batch["gt_speeds"] = jnp.asarray(gt_speeds)
    return batch


def _random_outputs(rng, B, num_classes, strides, nuscenes=False, max_attr=4):
    """Per-level random head outputs: torch NCHW lists + jax NHWC lists."""
    shapes = _feature_shapes(strides)
    C = num_classes
    chans = {
        "logits": C, "box2d_reg": 4, "centerness": 1,
        "quat": 4 * C, "proj_ctr": 2 * C, "depth": C, "size": 3 * C, "conf": C,
    }
    if nuscenes:
        chans["attr_logits"] = max_attr
        chans["speed"] = 1
    torch_out, jax_out = {}, {}
    for key, c in chans.items():
        tlist, jlist = [], []
        for (h, w) in shapes:
            x = rng.randn(B, c, h, w).astype(np.float32)
            if key == "box2d_reg":
                x = np.abs(x) * 40.0  # post-relu ltrb scale
            elif key == "depth":
                x = x * 8.0 + 15.0
            elif key == "speed":
                x = np.abs(x)  # post-relu
            tlist.append(torch.from_numpy(x))
            jlist.append(jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        torch_out[key] = tlist
        jax_out[key] = jlist
    return torch_out, jax_out


def _level_offsets(strides):
    offs, total = [], 0
    for (h, w) in _feature_shapes(strides):
        offs.append(total)
        total += h * w
    return offs, total


def _ref_flat_to_bp(flat, B, strides):
    """Reference (L, B, HW)-ordered flat array -> (B, P) level-major like ours."""
    flat = flat.numpy() if isinstance(flat, torch.Tensor) else np.asarray(flat)
    chunks = []
    start = 0
    for (h, w) in _feature_shapes(strides):
        n = h * w
        chunks.append(flat[start:start + B * n].reshape(B, n, *flat.shape[1:]))
        start += B * n
    assert start == flat.shape[0]
    return np.concatenate(chunks, axis=1)


@pytest.fixture(scope="module")
def kitti_case():
    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    num_classes = cfg.DD3D.NUM_CLASSES
    rng = np.random.RandomState(11)
    gt_list, intrinsics = _synthetic_gt(rng, num_classes, with_empty_image=True)
    B = len(gt_list)
    torch_out, jax_out = _random_outputs(rng, B, num_classes, STRIDES)

    # --- torch reference path ---
    locs = [compute_features_locations(h, w, s, cfg.DD3D.FEATURE_LOCATIONS_OFFSET)
            for (h, w), s in zip(_feature_shapes(STRIDES), STRIDES)]
    preparer = TorchTargetPreparer(
        num_classes, STRIDES, cfg.DD3D.SIZES_OF_INTEREST,
        center_sample=cfg.DD3D.FCOS3D.PREPARE_TARGET.CENTER_SAMPLE,
        radius=cfg.DD3D.FCOS3D.PREPARE_TARGET.POS_RADIUS,
    )
    t_targets = preparer(locs, _torch_gt_instances(gt_list))
    t_losses2d, t_extra = torch_fcos2d_loss(
        torch_out["logits"], torch_out["box2d_reg"], torch_out["centerness"],
        t_targets, num_classes,
        focal_alpha=cfg.DD3D.FCOS2D.LOSS.ALPHA, focal_gamma=cfg.DD3D.FCOS2D.LOSS.GAMMA,
        loc_loss_type=cfg.DD3D.FCOS2D.LOSS.LOC_LOSS_TYPE,
    )
    inv_K = torch.from_numpy(np.linalg.inv(intrinsics).astype(np.float32))
    f3 = cfg.DD3D.FCOS3D
    t_losses3d = torch_fcos3d_loss(
        torch_out["quat"], torch_out["proj_ctr"], torch_out["depth"],
        torch_out["size"], torch_out["conf"],
        inv_K, t_extra, t_targets, num_classes,
        canon_box_sizes=f3.CANONICAL_BOX3D_SIZES,
        min_depth=f3.MIN_DEPTH, max_depth=f3.MAX_DEPTH,
        scale_depth_by_focal_lengths_factor=f3.SCALE_DEPTH_BY_FOCAL_LENGTHS_FACTOR,
        predict_allocentric_rot=f3.PREDICT_ALLOCENTRIC_ROT,
        scale_depth_by_focal_lengths=f3.SCALE_DEPTH_BY_FOCAL_LENGTHS,
        predict_distance=f3.PREDICT_DISTANCE,
        class_agnostic=f3.CLASS_AGNOSTIC_BOX3D,
        smooth_l1_beta=f3.LOSS.SMOOTH_L1_BETA,
        max_loss_per_group=f3.LOSS.MAX_LOSS_PER_GROUP_DISENT,
        box3d_loss_weight=f3.LOSS.WEIGHT_BOX3D,
        conf3d_loss_weight=f3.LOSS.WEIGHT_CONF3D,
        conf_3d_temperature=f3.LOSS.CONF_3D_TEMPERATURE,
    )

    # --- jax path (the exact train-step loss entry point) ---
    batch = _jax_batch(gt_list, intrinsics)
    j_losses, j_targets, j_extra = dd3d_losses(
        cfg, jax_out, batch, return_aux=True, strides=STRIDES
    )
    j_losses = jax.tree_util.tree_map(np.asarray, j_losses)
    j_targets = jax.tree_util.tree_map(np.asarray, j_targets)
    j_extra = jax.tree_util.tree_map(np.asarray, j_extra)
    return dict(
        cfg=cfg, B=B, gt_list=gt_list,
        t_targets=t_targets, t_losses2d=t_losses2d, t_extra=t_extra, t_losses3d=t_losses3d,
        j_losses=j_losses, j_targets=j_targets, j_extra=j_extra,
    )


def test_labels_match_per_location(kitti_case):
    c = kitti_case
    ref = _ref_flat_to_bp(c["t_targets"]["labels"], c["B"], STRIDES)
    np.testing.assert_array_equal(ref, c["j_targets"]["labels"])


def test_pos_mask_matches(kitti_case):
    c = kitti_case
    ref_labels = _ref_flat_to_bp(c["t_targets"]["labels"], c["B"], STRIDES)
    ref_pos = ref_labels != c["cfg"].DD3D.NUM_CLASSES
    np.testing.assert_array_equal(ref_pos, c["j_targets"]["pos_mask"])
    # sanity: the synthetic GT produces a meaningful number of positives
    assert int(ref_pos.sum()) > 20


def test_box2d_reg_targets_match_at_positives(kitti_case):
    c = kitti_case
    ref = _ref_flat_to_bp(c["t_targets"]["box2d_reg_targets"], c["B"], STRIDES)
    pos = c["j_targets"]["pos_mask"]
    got = np.moveaxis(c["j_targets"]["box2d_reg_targets"], 1, -1)  # (B, 4, P) -> (B, P, 4)
    np.testing.assert_allclose(ref[pos], got[pos], rtol=0, atol=1e-5)


def test_target_inds_match_at_positives(kitti_case):
    c = kitti_case
    # reference target_inds carry a cumulative per-image offset; ours are
    # per-image GT indices — undo the offset before comparing.
    ref_ti = _ref_flat_to_bp(c["t_targets"]["target_inds"], c["B"], STRIDES)
    ref_im = _ref_flat_to_bp(c["t_targets"]["im_inds"], c["B"], STRIDES)
    counts = np.array([len(d["boxes2d"]) for d in c["gt_list"]])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = c["j_targets"]["pos_mask"]
    ref_local = ref_ti - offsets[ref_im]
    np.testing.assert_array_equal(ref_local[pos], c["j_targets"]["target_inds"][pos])


def test_box3d_targets_match_at_positives(kitti_case):
    c = kitti_case
    t3d = c["t_targets"]["box3d_targets"]
    ref = np.concatenate(
        [t3d.quat.numpy(), t3d.proj_ctr.numpy(), t3d.depth.numpy(), t3d.size.numpy()], axis=-1
    )
    ref = _ref_flat_to_bp(torch.from_numpy(ref), c["B"], STRIDES)
    pos = c["j_targets"]["pos_mask"]
    got = np.moveaxis(c["j_targets"]["box3d_targets"], 1, -1)  # (B, 10, P) -> (B, P, 10)
    np.testing.assert_allclose(ref[pos], got[pos], rtol=0, atol=1e-6)


def test_centerness_and_denom_match(kitti_case):
    c = kitti_case
    # reference centerness_targets live on pos_inds in (L, B, HW) order;
    # rebuild a dense (B, P) map to compare against ours.
    pos = c["j_targets"]["pos_mask"]
    ref_ctr_posonly = c["t_extra"]["centerness_targets"].numpy()
    ref_labels_flat = c["t_targets"]["labels"].numpy()
    dense = np.zeros(ref_labels_flat.shape[0], dtype=np.float64)
    dense[c["t_targets"]["pos_inds"].numpy()] = ref_ctr_posonly
    ref_dense = _ref_flat_to_bp(torch.from_numpy(dense), c["B"], STRIDES)
    np.testing.assert_allclose(ref_dense[pos], c["j_extra"]["centerness_targets"][pos], atol=1e-5)
    np.testing.assert_allclose(c["t_extra"]["loss_denom"], c["j_extra"]["loss_denom"], rtol=1e-5)


def test_fcos2d_loss_scalars_match(kitti_case):
    c = kitti_case
    for k in ("loss_cls", "loss_box2d_reg", "loss_centerness"):
        ref = float(c["t_losses2d"][k])
        got = float(c["j_losses"][k])
        np.testing.assert_allclose(got, ref, rtol=2e-4, err_msg=k)


def test_fcos3d_loss_scalars_match(kitti_case):
    c = kitti_case
    for k in ("loss_box3d_quat", "loss_box3d_proj_ctr", "loss_box3d_depth",
              "loss_box3d_size", "loss_conf3d"):
        ref = float(c["t_losses3d"][k])
        got = float(c["j_losses"][k])
        np.testing.assert_allclose(got, ref, rtol=5e-4, err_msg=k)


# ---------------------------------------------------------------------------
# NuScenes: attribute / speed losses (incl. ignore-attr + NaN-speed rows)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def nusc_case():
    cfg = get_experiment_cfg("dd3d_nusc_dla34")
    num_classes = cfg.DD3D.NUM_CLASSES
    max_attr = cfg.DD3D.NUSC.MAX_NUM_ATTRIBUTES
    rng = np.random.RandomState(23)
    # no empty image: the reference nuScenes preparer cannot handle one
    # (nuscenes_dd3d.py:124-140 skips attribute appends on the empty path)
    gt_list, intrinsics = _synthetic_gt(
        rng, num_classes, with_empty_image=False, nuscenes=True, max_attr=max_attr
    )
    B = len(gt_list)
    torch_out, jax_out = _random_outputs(rng, B, num_classes, STRIDES, nuscenes=True, max_attr=max_attr)

    locs = [compute_features_locations(h, w, s, cfg.DD3D.FEATURE_LOCATIONS_OFFSET)
            for (h, w), s in zip(_feature_shapes(STRIDES), STRIDES)]
    preparer = TorchTargetPreparer(
        num_classes, STRIDES, cfg.DD3D.SIZES_OF_INTEREST,
        center_sample=cfg.DD3D.FCOS3D.PREPARE_TARGET.CENTER_SAMPLE,
        radius=cfg.DD3D.FCOS3D.PREPARE_TARGET.POS_RADIUS,
    )
    t_targets = preparer(locs, _torch_gt_instances(gt_list))
    _t2d, t_extra = torch_fcos2d_loss(
        torch_out["logits"], torch_out["box2d_reg"], torch_out["centerness"],
        t_targets, num_classes,
        focal_alpha=cfg.DD3D.FCOS2D.LOSS.ALPHA, focal_gamma=cfg.DD3D.FCOS2D.LOSS.GAMMA,
        loc_loss_type=cfg.DD3D.FCOS2D.LOSS.LOC_LOSS_TYPE,
    )
    t_nusc = torch_nuscenes_loss(
        torch_out["attr_logits"], torch_out["speed"], t_extra, t_targets, max_attr,
        attr_loss_weight=cfg.DD3D.NUSC.LOSS.WEIGHT_ATTR,
        speed_loss_weight=cfg.DD3D.NUSC.LOSS.WEIGHT_SPEED,
    )

    batch = _jax_batch(gt_list, intrinsics, nuscenes=True)
    j_losses = nuscenes_dd3d_losses(cfg, jax_out, batch, strides=STRIDES)
    j_losses = jax.tree_util.tree_map(np.asarray, j_losses)
    return dict(t_nusc=t_nusc, j_losses=j_losses)


def test_nuscenes_attr_speed_losses_match(nusc_case):
    for k in ("loss_attr", "loss_speed"):
        ref = float(nusc_case["t_nusc"][k])
        got = float(nusc_case["j_losses"][k])
        np.testing.assert_allclose(got, ref, rtol=5e-4, err_msg=k)


def test_loss_gradients_finite_at_degenerate_rotations():
    """Identity rotations have three exact-zero matrix_to_quaternion
    candidates; an unguarded sqrt there makes 0 * inf = NaN cotangents
    (this NaN'd real training at iter ~20 of the overfit smoke). Zero head
    outputs + identity GT quats at the principal point hit every degenerate
    branch at once — the gradient must stay finite."""
    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    num_classes = cfg.DD3D.NUM_CLASSES
    B = 1
    k = np.array([[355.0, 0.0, 128.0], [0.0, 350.0, 64.0], [0.0, 0.0, 1.0]], np.float32)
    gt_list = [{
        "boxes2d": np.array([[118.0, 54.0, 138.0, 74.0]], np.float32),  # centered box
        "classes": np.zeros(1, np.int64),
        "quat": np.array([[1.0, 0, 0, 0]], np.float32),  # identity rotation
        "proj_ctr": np.array([[128.0, 64.0]], np.float32),  # principal point
        "depth": np.array([[10.0]], np.float32),
        "size": np.array([[1.6, 3.9, 1.5]], np.float32),
        "intrinsics": k,
    }]
    batch = _jax_batch(gt_list, k[None])
    shapes = _feature_shapes(STRIDES)
    C = num_classes
    outputs = {
        key: [jnp.zeros((B, hh, ww, c), jnp.float32) for hh, ww in shapes]
        for key, c in [("logits", C), ("box2d_reg", 4), ("centerness", 1),
                       ("quat", 4 * C), ("proj_ctr", 2 * C), ("depth", C),
                       ("size", 3 * C), ("conf", C)]
    }

    def total(outs):
        return sum(dd3d_losses(cfg, outs, batch, strides=STRIDES).values())

    val, grads = jax.value_and_grad(total)(outputs)
    assert np.isfinite(float(val))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
