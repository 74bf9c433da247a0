"""Batched quaternion math in pure JAX.

Replaces the reference's pytorch3d dependency
(`tridet/structures/boxes3d.py:6`, `tridet/utils/geometry.py:7`).
Convention: real-first (w, x, y, z), matching pytorch3d / pyquaternion.
All functions are batched over leading dimensions and jit/vmap-safe.
"""
import jax
import jax.numpy as jnp

EPS = 1e-9


def matmul3x3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched (..., 3, 3) @ (..., 3, 3) as broadcast-multiply-reduce.

    A dot_general with 3x3 contracting dims pads to the 128-lane MXU tile and
    wastes >99% of it; the explicit broadcast form stays on the VPU.
    """
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def matvec3(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched (..., 3, 3) @ (..., 3) in broadcast form (VPU, not MXU)."""
    return jnp.sum(m * v[..., None, :], axis=-1)


def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz unit quaternion -> (..., 3, 3) rotation matrix."""
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Branchless candidate-selection algorithm (numerically robust for all
    rotations): compute the four candidate quaternions, one per largest
    diagonal combination, and select by the largest denominator.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    # max(x, eps) (not 0) keeps d/dx sqrt finite at degenerate candidates:
    # unselected candidates receive zero cotangents, and 0 * inf = NaN would
    # otherwise poison gradients (e.g. identity rotation has three exact-zero
    # candidates).
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 1e-12))

    # Candidate quaternions (unnormalized), rows: by-w, by-x, by-y, by-z.
    cand = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m01 + m10, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m01 + m10, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m02 + m20, m12 + m21, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4)
    denom = 2.0 * jnp.maximum(q_abs, 0.1)  # floor matches pytorch3d's stabilization
    cand = cand / denom[..., None]

    # Select the best candidate with a one-hot contraction: take_along_axis
    # here is a last-axis gather that the TPU scalar core serializes
    # (measured: a large share of the whole box-decode cost); the masked sum
    # is pure VPU work.
    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=cand.dtype)  # (..., 4)
    quat = jnp.sum(cand * onehot[..., None], axis=-2)
    return quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), EPS)


def quaternion_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions, batched."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quaternion_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def normalize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), EPS)
