import numpy as np
import jax.numpy as jnp

from dd3d_tpu.structures.boxes3d import Boxes3D, generic_corners

K = np.array([[700.0, 0.0, 600.0], [0.0, 700.0, 180.0], [0.0, 0.0, 1.0]], dtype=np.float32)


def test_identity_corners_extents():
    # size = (w, l, h); x-extent should be l, y-extent w, z-extent h
    # (wlh -> lwh swap, tridet/structures/boxes3d.py:59-60).
    quat = jnp.asarray([[1.0, 0, 0, 0]])
    tvec = jnp.asarray([[1.0, 2.0, 30.0]])
    size = jnp.asarray([[1.6, 3.9, 1.5]])  # w, l, h
    c = np.asarray(generic_corners(quat, tvec, size))[0]
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c[:, 0].max() - c[:, 0].min(), 3.9, atol=1e-5)  # length
    np.testing.assert_allclose(c[:, 1].max() - c[:, 1].min(), 1.6, atol=1e-5)  # width
    np.testing.assert_allclose(c[:, 2].max() - c[:, 2].min(), 1.5, atol=1e-5)  # height
    np.testing.assert_allclose(c.mean(axis=0), [1.0, 2.0, 30.0], atol=1e-5)


def test_corner_order_matches_reference_signs():
    # First corner has signs (+x, +y, +z) of (l/2, w/2, h/2) around tvec.
    c = np.asarray(generic_corners(jnp.asarray([[1.0, 0, 0, 0]]), jnp.zeros((1, 3)), jnp.asarray([[2.0, 4.0, 6.0]])))[0]
    np.testing.assert_allclose(c[0], [2.0, 1.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(c[6], [-2.0, -1.0, -3.0], atol=1e-6)


def test_from_vectors_projection_roundtrip(rng):
    tvec = np.array([[2.0, 1.0, 20.0], [-3.0, 0.5, 40.0]], dtype=np.float32)
    quat = np.tile(np.array([[1.0, 0, 0, 0]], dtype=np.float32), (2, 1))
    size = np.tile(np.array([[1.6, 3.9, 1.5]], dtype=np.float32), (2, 1))
    vecs = np.concatenate([quat, tvec, size], axis=1)
    boxes = Boxes3D.from_vectors(jnp.asarray(vecs), jnp.asarray(K))
    # tvec property must reproduce the input translation.
    np.testing.assert_allclose(np.asarray(boxes.tvec), tvec, atol=1e-3)
    np.testing.assert_allclose(np.asarray(boxes.depth[:, 0]), tvec[:, 2], atol=1e-5)
    # vectorize round-trips.
    np.testing.assert_allclose(np.asarray(boxes.vectorize()), vecs, atol=1e-3)


def test_rotated_corners_90deg_yaw():
    # 90 deg about y (vertical in camera frame): length swings from x to z.
    s = np.sqrt(0.5)
    quat = jnp.asarray([[s, 0.0, s, 0.0]])
    size = jnp.asarray([[1.0, 4.0, 2.0]])
    c = np.asarray(generic_corners(quat, jnp.zeros((1, 3)), size))[0]
    # R_y(90): length (x) -> z, height (z) -> x, width (y) unchanged.
    np.testing.assert_allclose(c[:, 2].max() - c[:, 2].min(), 4.0, atol=1e-5)
    np.testing.assert_allclose(c[:, 0].max() - c[:, 0].min(), 2.0, atol=1e-5)
    np.testing.assert_allclose(c[:, 1].max() - c[:, 1].min(), 1.0, atol=1e-5)
