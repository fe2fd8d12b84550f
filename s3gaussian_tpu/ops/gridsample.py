"""Bilinear 2D grid sampling (align_corners=True, border padding).

Functional parity with the reference's ``grid_sample_wrapper``
(scene/hexplane.py:21-46), which wraps ``F.grid_sample(mode='bilinear',
padding_mode='border', align_corners=True)``.  Forward is four gathers +
lerp; the gradient w.r.t. the grid comes from autodiff (a scatter-add — see
``models/hexplane.py`` for the performance notes and batching strategy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_2d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample a feature plane at normalized coordinates.

    Args:
      grid: [C, H, W] feature plane.
      coords: [N, 2] in [-1, 1]; coords[:, 0] indexes W (x), coords[:, 1]
        indexes H (y) — torch grid_sample convention.

    Returns: [N, C]
    """
    c, h, w = grid.shape
    # align_corners=True mapping, border padding = clamp
    x = (coords[:, 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y = jnp.clip(y, 0.0, h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    flat = grid.reshape(c, h * w).T  # [HW, C]

    def take(yy, xx):
        return flat[yy * w + xx]     # [N, C]

    v00 = take(y0i, x0i)
    v01 = take(y0i, x1i)
    v10 = take(y1i, x0i)
    v11 = take(y1i, x1i)
    wx = wx[:, None]
    wy = wy[:, None]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))
