"""Component-major ("P-minor") geometry for the dense training losses.

TPU tiles the two minor axes of every array to (8 sublanes, 128 lanes). The
natural (B, P, comp) / (B, P, 3, 3) / (B, P, 8, 3) shapes of the 3D loss
put tiny component axes on the lanes, padding them to 128 and inflating
HBM traffic 25-50x (measured: the 3D loss branch cost 51 ms of a 169 ms
batch-16 train step). Here every map is laid out (B, comp, P) with the
large location axis P minor: P pads 10230 -> 10240 (free) and components
sit on sublanes.

All math is elementwise multiply-add on (B, P) slices (VPU, fp32-exact — no
dot_general, so no bf16 truncation; see prepare_targets.py). Semantics
mirror ops/geometry.py + ops/quaternion.py + structures/boxes3d.py, which
remain the (.., comp)-trailing API for inference/decode shapes.

Reference semantics: tridet/utils/geometry.py:15-55 (allocentric),
tridet/structures/boxes3d.py:48-64 (corners, wlh->lwh swap),
pytorch3d rotation_conversions (quaternion<->matrix).
"""
from typing import Tuple

import jax
import jax.numpy as jnp

EPS = 1e-7

# BOX3D_CORNER_MAPPING (structures/boxes3d.py): signs of the 8 canonical
# corners in (l, w, h) object axes.
_CORNER_SIGNS = (
    (1, 1, 1), (1, -1, 1), (1, -1, -1), (1, 1, -1),
    (-1, 1, 1), (-1, -1, 1), (-1, -1, -1), (-1, 1, -1),
)


def normalize_rows(x: jnp.ndarray, axis: int = 1, eps: float = EPS) -> jnp.ndarray:
    # floor INSIDE the sqrt: d/ds sqrt(s) at s=0 is inf, so clamping only
    # after the sqrt still propagates NaN gradients for exactly-zero rows
    # (e.g. an all-zero predicted quaternion).
    n = jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis, keepdims=True), eps * eps))
    return x / n


def quaternion_to_matrix_t(quat: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """(B, 4, P) wxyz (unit) -> 9 (B, P) rotation components, row-major."""
    w, x, y, z = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
    two_s = 2.0 / jnp.maximum(w * w + x * x + y * y + z * z, EPS)
    return (
        1 - two_s * (y * y + z * z), two_s * (x * y - z * w), two_s * (x * z + y * w),
        two_s * (x * y + z * w), 1 - two_s * (x * x + z * z), two_s * (y * z - x * w),
        two_s * (x * z - y * w), two_s * (y * z + x * w), 1 - two_s * (x * x + y * y),
    )


def matrix_to_quaternion_t(m: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """9 row-major (B, P) components -> (B, 4, P) wxyz.

    Same 4-candidate algorithm as ops/quaternion.matrix_to_quaternion
    (pytorch3d): pick the best-conditioned candidate per element.
    """
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = m
    # floor at 1e-12 (not 0): d/dx sqrt(0) = inf, and the unselected
    # candidates' zero cotangents would make 0 * inf = NaN in the backward —
    # an identity-like rotation has three exact-zero candidates (same guard
    # as ops/quaternion.matrix_to_quaternion; unguarded this NaN'd real
    # training at iter ~20 of the overfit smoke).
    q_abs2 = (
        jnp.maximum(1.0 + m00 + m11 + m22, 1e-12),
        jnp.maximum(1.0 + m00 - m11 - m22, 1e-12),
        jnp.maximum(1.0 - m00 + m11 - m22, 1e-12),
        jnp.maximum(1.0 - m00 - m11 + m22, 1e-12),
    )
    q_abs = tuple(jnp.sqrt(v) for v in q_abs2)

    # candidate i scaled by 1 / (2 * max(q_abs[i], 0.1))
    def cand(i, comps):
        denom = 2.0 * jnp.maximum(q_abs[i], 0.1)
        return tuple(c / denom for c in comps)

    c0 = cand(0, (q_abs2[0], m21 - m12, m02 - m20, m10 - m01))
    c1 = cand(1, (m21 - m12, q_abs2[1], m01 + m10, m02 + m20))
    c2 = cand(2, (m02 - m20, m01 + m10, q_abs2[2], m12 + m21))
    c3 = cand(3, (m10 - m01, m20 + m02, m21 + m12, q_abs2[3]))

    best01 = q_abs[0] >= q_abs[1]
    best23 = q_abs[2] >= q_abs[3]
    a = tuple(jnp.where(best01, x, y) for x, y in zip(c0, c1))
    a_abs = jnp.where(best01, q_abs[0], q_abs[1])
    b = tuple(jnp.where(best23, x, y) for x, y in zip(c2, c3))
    b_abs = jnp.where(best23, q_abs[2], q_abs[3])
    bestab = a_abs >= b_abs
    quat = tuple(jnp.where(bestab, x, y) for x, y in zip(a, b))
    return jnp.stack(quat, axis=1)


def unproject_t(xy: jnp.ndarray, inv_k: jnp.ndarray) -> jnp.ndarray:
    """xy (B, 2, P) pixels + inv_K (B, 3, 3) -> rays (B, 3, P)."""
    k = inv_k[:, :, :, None]  # (B, 3, 3, 1)
    x, y = xy[:, 0], xy[:, 1]
    rx = k[:, 0, 0] * x + k[:, 0, 1] * y + k[:, 0, 2]
    ry = k[:, 1, 0] * x + k[:, 1, 1] * y + k[:, 1, 2]
    rz = k[:, 2, 0] * x + k[:, 2, 1] * y + k[:, 2, 2]
    return jnp.stack([rx, ry, rz], axis=1)


def allocentric_to_egocentric_t(quat: jnp.ndarray, proj_ctr: jnp.ndarray, inv_k: jnp.ndarray) -> jnp.ndarray:
    """(B, 4, P) allocentric quat + (B, 2, P) projected centers -> (B, 4, P)
    egocentric quat. cf. tridet/utils/geometry.py:15-55."""
    r_obj = quaternion_to_matrix_t(quat)  # 9 x (B, P)

    ray = unproject_t(proj_ctr, inv_k)  # (B, 3, P)
    z = normalize_rows(ray, axis=1)
    zx, zy, zz = z[:, 0], z[:, 1], z[:, 2]
    # y = e_y - z_y * z, normalized
    yx = -zy * zx
    yy = 1.0 - zy * zy
    yz = -zy * zz
    yn = jnp.sqrt(jnp.maximum(yx * yx + yy * yy + yz * yz, EPS * EPS))
    yx, yy, yz = yx / yn, yy / yn, yz / yn
    # x = y cross z
    xx = yy * zz - yz * zy
    xy = yz * zx - yx * zz
    xz = yx * zy - yy * zx

    # R_local_to_global columns = (x, y, z); R_out = R_l2g @ R_obj
    l2g = (xx, yx, zx, xy, yy, zy, xz, yz, zz)  # row-major

    def matmul_rows(a, b):
        out = []
        for i in range(3):
            for j in range(3):
                out.append(
                    a[3 * i + 0] * b[0 * 3 + j] + a[3 * i + 1] * b[1 * 3 + j] + a[3 * i + 2] * b[2 * 3 + j]
                )
        return tuple(out)

    r_out = matmul_rows(l2g, r_obj)
    ego = matrix_to_quaternion_t(r_out)
    return normalize_rows(ego, axis=1)


def corners_t(quat: jnp.ndarray, proj_ctr: jnp.ndarray, depth: jnp.ndarray,
              size: jnp.ndarray, inv_k: jnp.ndarray) -> jnp.ndarray:
    """Vision-parameterized box corners, component-major.

    quat (B, 4, P) wxyz; proj_ctr (B, 2, P); depth (B, P); size (B, 3, P)
    (w, l, h); inv_K (B, 3, 3). Returns (B, 24, P): 8 corners x (x, y, z),
    corner-major — matching boxes3d corners order
    (structures/boxes3d.py:48-64, wlh -> lwh swap included).
    """
    r = quaternion_to_matrix_t(normalize_rows(quat, axis=1))  # 9 x (B, P)
    ray = unproject_t(proj_ctr, inv_k)  # (B, 3, P)
    tx, ty, tz = ray[:, 0] * depth, ray[:, 1] * depth, ray[:, 2] * depth

    # wlh -> lwh: object-frame extents along (x=l, y=w, z=h)
    half_l = 0.5 * size[:, 1]
    half_w = 0.5 * size[:, 0]
    half_h = 0.5 * size[:, 2]

    rows = []
    for (sx, sy, sz) in _CORNER_SIGNS:
        cx = sx * half_l
        cy = sy * half_w
        cz = sz * half_h
        rows.append(r[0] * cx + r[1] * cy + r[2] * cz + tx)
        rows.append(r[3] * cx + r[4] * cy + r[5] * cz + ty)
        rows.append(r[6] * cx + r[7] * cy + r[8] * cz + tz)
    return jnp.stack(rows, axis=1)  # (B, 24, P)
