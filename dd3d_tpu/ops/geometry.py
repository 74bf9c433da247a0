"""Camera geometry ops in pure JAX.

Replaces `tridet/utils/geometry.py` (pytorch3d + cv2 based) with batched,
jit-safe jnp equivalents.
"""
import jax
import jax.numpy as jnp

from dd3d_tpu.ops.quaternion import matmul3x3, matrix_to_quaternion, matvec3, quaternion_to_matrix

EPS = 1e-7


def homogenize_points(xy: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) -> (..., 3) by appending ones. cf. tridet/utils/geometry.py:58-72."""
    return jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)


def unproject_points2d(points2d: jnp.ndarray, inv_K: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """Lift pixel coordinates to rays.

    points2d: (N, ..., 2) pixel xy; inv_K: (N, 3, 3) or (3, 3).
    Returns (N, ..., 3) = inv_K @ [x, y, 1]. cf. tridet/utils/geometry.py:86-112.
    """
    pts = homogenize_points(points2d)
    if inv_K.ndim == 2:
        out = jnp.einsum("ij,...j->...i", inv_K, pts, precision=jax.lax.Precision.HIGHEST)
    else:
        # Align leading dims: (N, 3, 3) against (N, ..., 3) -> broadcastable
        # (N, 1..., 3, 3) then batched matmul.
        k = inv_K
        while k.ndim - 2 < pts.ndim - 1:
            k = k[..., None, :, :]
        out = matvec3(k, pts)
    return out * scale


def project_points3d(points3d: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pinhole projection (no distortion).

    points3d: (..., 3) camera-frame points; K: (3, 3) or batched (N, 3, 3).
    Returns (..., 2). Replaces the cv2.projectPoints call in
    tridet/utils/geometry.py:77-83 (zero rvec/tvec/distortion there too).
    """
    if K.ndim == 2:
        uvw = jnp.einsum("ij,...j->...i", K, points3d, precision=jax.lax.Precision.HIGHEST)
    else:
        uvw = jnp.einsum("nij,n...j->n...i", K, points3d, precision=jax.lax.Precision.HIGHEST)
    return uvw[..., :2] / jnp.where(jnp.abs(uvw[..., 2:3]) < EPS, EPS, uvw[..., 2:3])


def allocentric_to_egocentric(quat: jnp.ndarray, proj_ctr: jnp.ndarray, inv_K: jnp.ndarray) -> jnp.ndarray:
    """Rotate an allocentric (viewing-ray local) orientation into the camera frame.

    Gram-Schmidt local frame from the viewing ray through `proj_ctr`, then
    R_global = R_local_to_global @ R_obj_to_local.
    cf. tridet/utils/geometry.py:15-55.

    quat: (N, 4) wxyz; proj_ctr: (N, 2); inv_K: (N, 3, 3).
    """
    R_obj_to_local = quaternion_to_matrix(quat)

    ray = unproject_points2d(proj_ctr, inv_K)
    z = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), EPS)

    # local y = global y minus its projection on z (Gram-Schmidt).
    y = jnp.asarray([0.0, 1.0, 0.0], dtype=z.dtype) - z[..., 1:2] * z
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), EPS)
    x = jnp.cross(y, z)

    R_local_to_global = jnp.stack([x, y, z], axis=-1)  # columns = local axes
    R_obj_to_global = matmul3x3(R_local_to_global, R_obj_to_local)
    ego = matrix_to_quaternion(R_obj_to_global)
    return ego / jnp.maximum(jnp.linalg.norm(ego, axis=-1, keepdims=True), EPS)


def egocentric_to_allocentric(quat: jnp.ndarray, proj_ctr: jnp.ndarray, inv_K: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `allocentric_to_egocentric` (used by dataset GT preparation)."""
    R_obj_to_global = quaternion_to_matrix(quat)

    ray = unproject_points2d(proj_ctr, inv_K)
    z = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), EPS)
    y = jnp.asarray([0.0, 1.0, 0.0], dtype=z.dtype) - z[..., 1:2] * z
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), EPS)
    x = jnp.cross(y, z)
    R_local_to_global = jnp.stack([x, y, z], axis=-1)

    R_obj_to_local = matmul3x3(jnp.swapaxes(R_local_to_global, -1, -2), R_obj_to_global)
    allo = matrix_to_quaternion(R_obj_to_local)
    return allo / jnp.maximum(jnp.linalg.norm(allo, axis=-1, keepdims=True), EPS)
