import numpy as np
import jax.numpy as jnp

from dd3d_tpu.ops.geometry import (
    allocentric_to_egocentric,
    egocentric_to_allocentric,
    project_points3d,
    unproject_points2d,
)

K = np.array([[721.5, 0.0, 609.5], [0.0, 721.5, 172.8], [0.0, 0.0, 1.0]], dtype=np.float32)


def test_project_unproject_roundtrip(rng):
    pts2d = jnp.asarray(rng.rand(10, 2) * 500)
    inv_K = jnp.asarray(np.linalg.inv(K))
    rays = unproject_points2d(pts2d, inv_K)
    depths = jnp.asarray(rng.rand(10, 1) * 50 + 1)
    pts3d = rays * depths
    back = project_points3d(pts3d, jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts2d), atol=1e-2)


def test_allocentric_roundtrip(rng):
    n = 64
    q = rng.randn(n, 4)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    ctr = rng.rand(n, 2) * np.array([1200, 350])
    inv_K = np.broadcast_to(np.linalg.inv(K), (n, 3, 3))

    ego = allocentric_to_egocentric(jnp.asarray(q), jnp.asarray(ctr), jnp.asarray(inv_K))
    allo = egocentric_to_allocentric(ego, jnp.asarray(ctr), jnp.asarray(inv_K))
    allo = np.asarray(allo)
    sign = np.sign(np.sum(q * allo, axis=1, keepdims=True))
    np.testing.assert_allclose(q, allo * sign, atol=1e-4)


def test_allocentric_at_principal_point_is_identity():
    # A ray through the principal point is the camera z-axis, so the local
    # frame equals the camera frame and allo == ego.
    q = np.array([[0.8, 0.1, 0.5, 0.2]])
    q = q / np.linalg.norm(q)
    ctr = np.array([[K[0, 2], K[1, 2]]])
    inv_K = np.linalg.inv(K)[None]
    ego = np.asarray(allocentric_to_egocentric(jnp.asarray(q), jnp.asarray(ctr), jnp.asarray(inv_K)))
    sign = np.sign(np.sum(q * ego))
    np.testing.assert_allclose(q, ego * sign, atol=1e-5)
