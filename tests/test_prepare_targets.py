import numpy as np
import jax.numpy as jnp

from dd3d_tpu.models.prepare_targets import build_location_bases, prepare_targets

STRIDES = [8, 16, 32, 64, 128]
SOI = [64, 128, 256, 512]


def _bases(h=128, w=128):
    shapes = [(h // s, w // s) for s in STRIDES]
    return build_location_bases(shapes, STRIDES, SOI), shapes


def test_single_box_assignment():
    (locs, strs, ranges, lvls), shapes = _bases(256, 256)
    # 100x100 box centered at (128, 128): max ltrb at center ~50..100 ->
    # level 0 band is (-1, 64], level 1 (64, 128].
    g = 8
    boxes2d = np.zeros((1, g, 4), dtype=np.float32)
    boxes2d[0, 0] = [78, 78, 178, 178]
    classes = np.zeros((1, g), dtype=np.int32)
    boxes3d = np.zeros((1, g, 10), dtype=np.float32)
    boxes3d[0, 0] = [1, 0, 0, 0, 128, 128, 20, 1.5, 3.9, 1.6]
    valid = np.zeros((1, g), dtype=bool)
    valid[0, 0] = True

    t = prepare_targets(
        locs, strs, ranges,
        jnp.asarray(boxes2d), jnp.asarray(classes), jnp.asarray(boxes3d), jnp.asarray(valid),
        num_classes=5,
    )
    labels = np.asarray(t["labels"])[0]
    pos = np.asarray(t["pos_mask"])[0]
    assert pos.sum() > 0
    # All positives must carry class 0.
    assert (labels[pos] == 0).all()
    # Negatives carry the background label.
    assert (labels[~pos] == 5).all()

    # Positive locations must be near the box center (center sampling radius
    # 1.5 * stride) and at levels whose size band contains ~100px.
    lvl = np.asarray(lvls)
    xy = np.asarray(locs)
    pos_xy = xy[pos]
    assert (np.abs(pos_xy - 128).max(axis=1) <= 1.5 * 128).all()
    pos_lvl = lvl[pos]
    assert set(pos_lvl.tolist()) <= {0, 1}

    # Regression targets: l + r == box width at positives.
    reg = np.moveaxis(np.asarray(t["box2d_reg_targets"]), 1, -1)[0][pos]
    np.testing.assert_allclose(reg[:, 0] + reg[:, 2], 100.0, atol=1e-4)
    np.testing.assert_allclose(reg[:, 1] + reg[:, 3], 100.0, atol=1e-4)

    # 3D targets gathered for positives.
    b3 = np.moveaxis(np.asarray(t["box3d_targets"]), 1, -1)[0][pos]
    np.testing.assert_allclose(b3[:, 6], 20.0, atol=1e-5)


def test_min_area_tiebreak():
    (locs, strs, ranges, lvls), shapes = _bases(256, 256)
    g = 4
    boxes2d = np.zeros((1, g, 4), dtype=np.float32)
    boxes2d[0, 0] = [68, 68, 188, 188]  # 120px box -> level-1 band (64,128]
    boxes2d[0, 1] = [78, 78, 178, 178]  # 100px box -> also level 1, smaller area
    classes = np.asarray([[1, 2, 0, 0]], dtype=np.int32)
    boxes3d = np.zeros((1, g, 10), dtype=np.float32)
    valid = np.asarray([[True, True, False, False]])

    t = prepare_targets(
        locs, strs, ranges,
        jnp.asarray(boxes2d), jnp.asarray(classes), jnp.asarray(boxes3d), jnp.asarray(valid),
        num_classes=5,
    )
    labels = np.asarray(t["labels"])[0]
    pos = np.asarray(t["pos_mask"])[0]
    xy = np.asarray(locs)
    lvl = np.asarray(lvls)
    # At the shared center, max(ltrb) is ~half the box size, so both boxes sit
    # in the level-0 band there; the min-area tie-break must pick the smaller
    # box (class 2) at every contested positive location.
    near_center = (np.abs(xy - 128).max(axis=1) < 24) & (lvl == 0) & pos
    assert near_center.any()
    assert (labels[near_center] == 2).all()


def test_no_gt():
    (locs, strs, ranges, _), _ = _bases()
    g = 4
    t = prepare_targets(
        locs, strs, ranges,
        jnp.zeros((2, g, 4)), jnp.zeros((2, g), dtype=jnp.int32), jnp.zeros((2, g, 10)),
        jnp.zeros((2, g), dtype=bool),
        num_classes=5,
    )
    assert not np.asarray(t["pos_mask"]).any()
    assert (np.asarray(t["labels"]) == 5).all()
