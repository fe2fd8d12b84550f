"""Camera and rigid-transform math.

Parity targets in the reference:
  * ``utils/graphics_utils.py:33-80`` (getWorld2View2, getProjectionMatrix,
    fov/focal conversions),
  * ``utils/general_utils.py:245-266`` (build_rotation from quaternion),
  * ``utils/graphics_utils.py:154-177`` (batch quaternion multiply).

All functions are pure jnp/numpy-compatible and differentiable.  Matrix
convention follows the reference: the rasterizer consumes *transposed*
(row-vector) matrices, i.e. ``world_view_transform = W2C^T`` and
``full_proj_transform = W2C^T @ P^T`` so points transform as ``p @ M``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) [..., 4] -> rotation matrix [..., 3, 3].

    Normalizes first, matching ``build_rotation``
    (reference utils/general_utils.py:245-266).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1),
        jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1),
        jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1),
    ], -2)
    return R


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of (w,x,y,z) quaternions, batched.

    Parity: ``batch_quaternion_multiply`` (utils/graphics_utils.py:154-177),
    which also normalizes the result.
    """
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    w2, x2, y2, z2 = (q2[..., i] for i in range(4))
    out = jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], -1)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray = np.zeros(3),
                  scale: float = 1.0) -> np.ndarray:
    """4x4 world->camera matrix.

    Parity: ``getWorld2View2`` (utils/graphics_utils.py:40-52).  ``R`` is the
    camera-to-world rotation (the reference stores it transposed), ``t`` the
    world-to-camera translation.
    """
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + translate) * scale
    C2W = C2W.copy()
    C2W[:3, 3] = cam_center
    return np.float32(np.linalg.inv(C2W))


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection with z in [0,1] NDC.

    Parity: ``getProjectionMatrix`` (utils/graphics_utils.py:54-74).
    """
    tan_y = math.tan(fovy / 2)
    tan_x = math.tan(fovx / 2)
    top = tan_y * znear
    right = tan_x * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def full_projection(world_view: np.ndarray, proj: np.ndarray) -> np.ndarray:
    """Row-vector composite transform: ``W2C^T @ P^T`` (scene/cameras.py:62)."""
    return (np.asarray(world_view).T @ np.asarray(proj).T).astype(np.float32)


def camera_center(world_view: np.ndarray) -> np.ndarray:
    """Camera origin in world space = inverse(W2C)[:3, 3]."""
    return np.linalg.inv(np.asarray(world_view))[:3, 3].astype(np.float32)


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))
