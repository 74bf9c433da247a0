import numpy as np
import jax.numpy as jnp

from dd3d_tpu.ops.quaternion import (
    matrix_to_quaternion,
    quaternion_multiply,
    quaternion_to_matrix,
    normalize_quaternion,
)


def random_quats(rng, n):
    q = rng.randn(n, 4)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_quat_matrix_roundtrip(rng):
    q = random_quats(rng, 100)
    m = quaternion_to_matrix(jnp.asarray(q))
    q2 = np.asarray(matrix_to_quaternion(m))
    # q and -q are the same rotation.
    sign = np.sign(np.sum(q * q2, axis=1, keepdims=True))
    np.testing.assert_allclose(q, q2 * sign, atol=1e-5)


def test_matrix_orthonormal(rng):
    q = random_quats(rng, 50)
    m = np.asarray(quaternion_to_matrix(jnp.asarray(q)))
    eye = np.matmul(m, np.swapaxes(m, 1, 2))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_multiply_matches_matrix_product(rng):
    q1 = jnp.asarray(random_quats(rng, 20))
    q2 = jnp.asarray(random_quats(rng, 20))
    q12 = quaternion_multiply(q1, q2)
    m12 = np.asarray(quaternion_to_matrix(q12))
    m_ref = np.asarray(quaternion_to_matrix(q1)) @ np.asarray(quaternion_to_matrix(q2))
    np.testing.assert_allclose(m12, m_ref, atol=1e-5)


def test_known_rotations():
    # 90 deg about z: q = (cos45, 0, 0, sin45); maps x->y.
    s = np.sqrt(0.5)
    q = jnp.asarray([[s, 0.0, 0.0, s]])
    m = np.asarray(quaternion_to_matrix(q))[0]
    np.testing.assert_allclose(m @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)

    # identity
    m = np.asarray(quaternion_to_matrix(jnp.asarray([[1.0, 0, 0, 0]])))[0]
    np.testing.assert_allclose(m, np.eye(3), atol=1e-7)


def test_normalize():
    q = jnp.asarray([[2.0, 0, 0, 0]])
    np.testing.assert_allclose(np.asarray(normalize_quaternion(q)), [[1.0, 0, 0, 0]], atol=1e-7)
