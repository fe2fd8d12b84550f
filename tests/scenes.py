"""Synthetic test scenes shared across tests."""

from __future__ import annotations

import numpy as np

from s3gaussian_tpu.ops.transforms import projection_matrix


def make_view_proj(fovx=1.0, fovy=1.0, znear=0.01, zfar=100.0):
    """Identity camera at origin looking down +z (reference convention)."""
    view = np.eye(4, dtype=np.float32)  # W2C^T == I
    proj = projection_matrix(znear, zfar, fovx, fovy)
    full = view.T @ proj.T
    return view.astype(np.float32), full.astype(np.float32)


def random_scene(n=80, seed=0, w=48, h=48, fov=1.0, zrange=(1.5, 8.0),
                 scale_range=(0.02, 0.12), opacity_range=(0.2, 0.95)):
    rng = np.random.default_rng(seed)
    tan = np.tan(fov / 2)
    z = rng.uniform(*zrange, n)
    x = rng.uniform(-0.8, 0.8, n) * tan * z
    y = rng.uniform(-0.8, 0.8, n) * tan * z
    means = np.stack([x, y, z], 1).astype(np.float32)
    scales = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opacity = rng.uniform(*opacity_range, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    view, full = make_view_proj(fov, fov)
    return dict(means=means, scales=scales, quats=quats, opacity=opacity,
                colors=colors, view=view, proj=full, fov=fov, w=w, h=h,
                tanfov=tan)


def cov3d_np(scales, quats):
    q = quats / np.linalg.norm(quats, axis=-1, keepdims=True)
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1),
        np.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1),
        np.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1),
    ], -2)
    M = R * scales[:, None, :]
    return M @ np.swapaxes(M, -1, -2)
