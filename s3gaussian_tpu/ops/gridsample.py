"""Bilinear 2D grid sampling (align_corners=True, border padding).

Functional parity with the reference's ``grid_sample_wrapper``
(scene/hexplane.py:21-46), which wraps ``F.grid_sample(mode='bilinear',
padding_mode='border', align_corners=True)``.

TPU note: gathers cost per *index* (~tens of ns each), so the four corner
lookups are packed into a single row gather: the plane is edge-padded and
its 2×2 neighborhoods flattened into [H·W, 4C] rows once per call (cheap,
bandwidth-bound), then each sample is ONE gather + lerp.  This cuts the
hexplane encoder's gather count 4× (24 plane-samples per point per step).
The gradient w.r.t. the grid comes from autodiff.
"""

from __future__ import annotations

import jax.numpy as jnp


def _quad_rows(grid: jnp.ndarray) -> jnp.ndarray:
    """[C,H,W] -> [H*W, 4C] rows of (v00,v01,v10,v11) per cell; border
    clamp == edge padding."""
    c, h, w = grid.shape
    gp = jnp.pad(grid, ((0, 0), (0, 1), (0, 1)), mode="edge")
    v00 = gp[:, :h, :w]
    v01 = gp[:, :h, 1:w + 1]
    v10 = gp[:, 1:h + 1, :w]
    v11 = gp[:, 1:h + 1, 1:w + 1]
    quad = jnp.stack([v00, v01, v10, v11], axis=0)      # [4,C,H,W]
    return quad.transpose(2, 3, 0, 1).reshape(h * w, 4 * c)


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
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    rows = _quad_rows(grid)[y0i * w + x0i]              # [N, 4C]
    v00, v01 = rows[:, 0:c], rows[:, c:2 * c]
    v10, v11 = rows[:, 2 * c:3 * c], rows[:, 3 * c:4 * c]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))
