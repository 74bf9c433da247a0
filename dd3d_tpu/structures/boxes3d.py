"""3D box containers as JAX pytrees.

Rebuild of `tridet/structures/boxes3d.py` (GenericBoxes3D / Boxes3D) as
immutable, batched, jit/vmap-safe structures:

- 10-D parameterization: quat (wxyz, 4) + tvec (3) + size (w, l, h) (3).
- Vision parameterization (`Boxes3D`): quat + projected center (2) + depth (1)
  + size (3) + per-box inverse intrinsics (3, 3); tvec is derived by
  unprojecting the center (tridet/structures/boxes3d.py:169-173).

Corner math is always fp32 (the reference wraps it in
`amp.autocast(enabled=False)`, tridet/structures/boxes3d.py:48).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dd3d_tpu.ops.geometry import unproject_points2d
from dd3d_tpu.ops.quaternion import quaternion_to_matrix

# Sign pattern of the 8 box corners in the object frame; transposed layout of
# BOX3D_CORNER_MAPPING in tridet/structures/boxes3d.py:13-17. Rows = corners,
# columns = (x, y, z) signs. Corner order matches the reference exactly
# (needed for corner-loss parity and KITTI eval conversion).
CORNER_SIGNS = jnp.asarray(
    [
        [1, 1, 1],
        [1, -1, 1],
        [1, -1, -1],
        [1, 1, -1],
        [-1, 1, 1],
        [-1, -1, 1],
        [-1, -1, -1],
        [-1, 1, -1],
    ],
    dtype=jnp.float32,
)


def generic_corners(quat: jnp.ndarray, tvec: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """8 corners of boxes given orientation, center, and (w, l, h) size.

    quat: (..., 4) wxyz; tvec: (..., 3); size: (..., 3) as (w, l, h).
    Returns (..., 8, 3) fp32 corners in the camera frame.

    The x-extent uses length, y-extent width, z-extent height: the reference
    swaps wlh->lwh before scaling corners (tridet/structures/boxes3d.py:59-60).
    """
    quat = quat.astype(jnp.float32)
    tvec = tvec.astype(jnp.float32)
    size = size.astype(jnp.float32)

    lwh = size[..., jnp.asarray([1, 0, 2])]
    corners_obj = 0.5 * lwh[..., None, :] * CORNER_SIGNS  # (..., 8, 3)
    R = quaternion_to_matrix(quat)  # (..., 3, 3)
    # Row-vector rotation: p' = p @ R^T  (== R @ p for column vectors).
    corners = jnp.einsum("...ij,...kj->...ki", R, corners_obj, precision=jax.lax.Precision.HIGHEST)
    return corners + tvec[..., None, :]


class Boxes3D(NamedTuple):
    """Vision-parameterized 3D boxes; all fields batched on the leading dims.

    quat: (..., 4) wxyz orientation (camera frame, egocentric)
    proj_ctr: (..., 2) projected box center in pixels
    depth: (..., 1) z-depth of the center
    size: (..., 3) (w, l, h) metric size
    inv_intrinsics: (..., 3, 3) per-box inverse camera intrinsics
    """

    quat: jnp.ndarray
    proj_ctr: jnp.ndarray
    depth: jnp.ndarray
    size: jnp.ndarray
    inv_intrinsics: jnp.ndarray

    @property
    def tvec(self) -> jnp.ndarray:
        """Center = unprojected ray * depth (tridet/structures/boxes3d.py:169-173)."""
        ray = unproject_points2d(self.proj_ctr.astype(jnp.float32), self.inv_intrinsics.astype(jnp.float32))
        return ray * self.depth.astype(jnp.float32)

    @property
    def corners(self) -> jnp.ndarray:
        return generic_corners(self.quat, self.tvec, self.size)

    def vectorize(self) -> jnp.ndarray:
        """10-D representation [quat(4), tvec(3), size(3)] like
        tridet/structures/boxes3d.py:150-152."""
        return jnp.concatenate([self.quat.astype(jnp.float32), self.tvec, self.size.astype(jnp.float32)], axis=-1)

    @classmethod
    def from_vectors(cls, vecs: jnp.ndarray, intrinsics: jnp.ndarray) -> "Boxes3D":
        """Build from 10-D [quat, tvec, size] vectors and one (3, 3) intrinsics.

        Projects tvec through K to get proj_ctr; depth = tvec_z.
        cf. tridet/structures/boxes3d.py:195-218.
        """
        vecs = jnp.asarray(vecs, dtype=jnp.float32).reshape(-1, 10)
        intrinsics = jnp.asarray(intrinsics, dtype=jnp.float32)
        quat = vecs[:, :4]
        tvec = vecs[:, 4:7]
        size = vecs[:, 7:]
        uvw = jnp.einsum("ij,nj->ni", intrinsics, tvec, precision=jax.lax.Precision.HIGHEST)
        proj_ctr = uvw[:, :2] / jnp.where(jnp.abs(uvw[:, 2:3]) < 1e-7, 1e-7, uvw[:, 2:3])
        depth = tvec[:, 2:3]
        inv_K = jnp.linalg.inv(intrinsics)
        inv_K = jnp.broadcast_to(inv_K, (vecs.shape[0], 3, 3))
        return cls(quat, proj_ctr, depth, size, inv_K)

    def replace(self, **kw) -> "Boxes3D":
        # NOTE: namedtuple._replace is unusable here (it validates via len(),
        # which NamedTuple derives from tuple arity); rebuild explicitly.
        fields = {f: getattr(self, f) for f in self._fields}
        fields.update(kw)
        return Boxes3D(**fields)

    @property
    def num_boxes(self) -> int:
        return self.quat.shape[0]
