"""Camera math and quaternion ops."""

import numpy as np
import jax.numpy as jnp

from s3gaussian_tpu.ops.transforms import (
    quat_to_rotmat, quat_multiply, world_to_view, projection_matrix,
    full_projection, camera_center, fov2focal, focal2fov)


def test_quat_identity():
    q = jnp.asarray([[1.0, 0, 0, 0]])
    np.testing.assert_allclose(np.asarray(quat_to_rotmat(q))[0], np.eye(3),
                               atol=1e-7)


def test_quat_rotation_properties():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(16, 4)).astype(np.float32)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (16, 3, 3)),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quat_multiply_composes_rotations():
    rng = np.random.default_rng(1)
    q1 = rng.normal(size=(8, 4)).astype(np.float32)
    q2 = rng.normal(size=(8, 4)).astype(np.float32)
    q1 /= np.linalg.norm(q1, axis=1, keepdims=True)
    q2 /= np.linalg.norm(q2, axis=1, keepdims=True)
    q12 = quat_multiply(jnp.asarray(q1), jnp.asarray(q2))
    R12 = np.asarray(quat_to_rotmat(q12))
    R1 = np.asarray(quat_to_rotmat(jnp.asarray(q1)))
    R2 = np.asarray(quat_to_rotmat(jnp.asarray(q2)))
    np.testing.assert_allclose(R12, np.einsum("nij,njk->nik", R1, R2),
                               atol=1e-5)


def test_world_to_view_roundtrip():
    rng = np.random.default_rng(2)
    # random rotation via QR
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3)
    w2c = world_to_view(Q, t)  # reference passes R = c2w rotation
    # camera center maps to origin
    cc = camera_center(w2c)
    p = np.concatenate([cc, [1.0]]) @ w2c.T
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)


def test_projection_matrix_ndc():
    znear, zfar = 0.01, 100.0
    fov = 0.9
    P = projection_matrix(znear, zfar, fov, fov)
    tan = np.tan(fov / 2)
    # point at z=znear on frustum edge maps to ndc x=1, z=0
    p = np.array([tan * znear, 0, znear, 1.0]) @ P.T
    np.testing.assert_allclose(p[0] / p[3], 1.0, atol=1e-5)
    np.testing.assert_allclose(p[2] / p[3], 0.0, atol=1e-4)
    # far plane maps to ndc z=1
    p = np.array([0, 0, zfar, 1.0]) @ P.T
    np.testing.assert_allclose(p[2] / p[3], 1.0, atol=1e-5)


def test_fov_focal_roundtrip():
    assert abs(focal2fov(fov2focal(1.1, 640), 640) - 1.1) < 1e-9
