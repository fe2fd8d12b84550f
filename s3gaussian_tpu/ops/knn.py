"""Mean squared 3-nearest-neighbor distance for Gaussian size init.

Replaces ``simple_knn._C.distCUDA2`` (reference submodules/simple-knn/
simple_knn.cu:45-183): the CUDA version is itself approximate — Morton-sort
the points, build 1024-point boxes, and only search candidate boxes.  Here
we use the same idea reduced to a sorted-window search: sort by 30-bit
Morton code and scan a ±window in sorted order.  Init-only (called once per
scene on the host), so this is plain numpy.
"""

from __future__ import annotations

import numpy as np


def _morton30(p: np.ndarray) -> np.ndarray:
    """30-bit Morton codes from normalized [0,1)^3 coordinates
    (10 bits/axis, like simple_knn.cu:45-70)."""
    q = np.clip((p * 1024.0).astype(np.uint32), 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << np.uint64(16))) & np.uint64(0x030000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x0300F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x030C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x09249249)
        return x

    return (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))


def mean_knn_dist2(points: np.ndarray, k: int = 3, window: int = 32) -> np.ndarray:
    """Per-point mean squared distance of the k nearest neighbors
    (approximate, Morton-window search). Parity: distCUDA2 usage at
    gaussian_model.py:153-154.

    Uses the multithreaded C++ implementation (native/s3g_native.cpp) when
    built; this numpy version is the fallback and the test oracle."""
    points = np.asarray(points, dtype=np.float32)
    n = points.shape[0]
    if n > 4096:
        from s3gaussian_tpu import native
        res = native.knn_mean_dist2(points, k=k, window=window)
        if res is not None:
            return res
    if n <= k:
        d = np.linalg.norm(points[:, None] - points[None], axis=-1) ** 2
        np.fill_diagonal(d, np.inf)
        d.sort(axis=1)
        return d[:, :max(1, n - 1)].mean(axis=1)

    lo = points.min(axis=0)
    span = np.maximum(points.max(axis=0) - lo, 1e-9)
    codes = _morton30((points - lo) / span)
    order = np.argsort(codes, kind="stable")
    sorted_pts = points[order]

    # window of offsets, excluding 0
    offs = np.concatenate([np.arange(-window, 0), np.arange(1, window + 1)])
    idx = np.arange(n)[:, None] + offs[None, :]
    idx = np.clip(idx, 0, n - 1)
    diff = sorted_pts[idx] - sorted_pts[:, None, :]
    d2 = np.einsum("nwc,nwc->nw", diff, diff)
    # self-comparisons from clipping get +inf
    d2[idx == np.arange(n)[:, None]] = np.inf
    d2.sort(axis=1)
    mean_d2 = d2[:, :k].mean(axis=1)

    out = np.empty(n, dtype=np.float32)
    out[order] = mean_d2
    return out
