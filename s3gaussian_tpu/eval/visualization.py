"""Visualization helpers.

Parity: ``utils/visualization_tools.py`` — turbo-style depth colormap
(visualize_depth, :182) and the HSV scene-flow wheel (scene_flow_to_rgb,
:242).  numpy/matplotlib only (host-side, eval-time).
"""

from __future__ import annotations

import numpy as np


def visualize_depth(depth: np.ndarray, lo: float = 4.0, hi: float = 120.0,
                    depth_curve_fn=lambda x: -np.log(x + 1e-6)) -> np.ndarray:
    """Depth [H,W] -> uint8 RGB using the turbo colormap over curved depth
    percentiles (visualization_tools.py:182-240 behavior)."""
    import matplotlib.cm as cm

    d = np.asarray(depth, np.float64)
    valid = d > 0
    if valid.any():
        lo_v = np.percentile(d[valid], 1)
        hi_v = np.percentile(d[valid], 99)
    else:
        lo_v, hi_v = lo, hi
    lo_c = depth_curve_fn(max(lo_v, 1e-3))
    hi_c = depth_curve_fn(max(hi_v, 1e-3))
    curved = depth_curve_fn(np.maximum(d, 1e-3))
    t = np.clip((curved - lo_c) / (hi_c - lo_c + 1e-12), 0, 1)
    rgb = cm.get_cmap("turbo")(t)[..., :3]
    rgb[~valid] = 1.0
    return (rgb * 255).astype(np.uint8)


def scene_flow_to_rgb(flow: np.ndarray, flow_max_radius: float = 1.0,
                      background: str = "dark") -> np.ndarray:
    """Project 3D flow to the xy plane and color by an HSV wheel
    (visualization_tools.py:242-323)."""
    import matplotlib.colors as mcolors

    fx, fy = flow[..., 0], flow[..., 1]
    mag = np.sqrt(fx ** 2 + fy ** 2)
    ang = (np.arctan2(fy, fx) / (2 * np.pi)) % 1.0
    mag = np.clip(mag / max(flow_max_radius, 1e-9), 0, 1)
    if background == "dark":
        hsv = np.stack([ang, np.ones_like(mag), mag], axis=-1)
    else:
        hsv = np.stack([ang, mag, np.ones_like(mag)], axis=-1)
    return mcolors.hsv_to_rgb(hsv).astype(np.float32)


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(np.asarray(x), 0, 1)).astype(np.uint8)
