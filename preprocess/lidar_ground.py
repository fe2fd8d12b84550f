"""Ground-point labeling for LiDAR sweeps (pure numpy, no TF).

Parity target: ``get_ground_np`` (`/root/reference/waymo_preprocess.py:175-213`)
— an iterative lowest-point-seeded plane fit (the LiDAR_SOT ground-removal
scheme): seed with points near the lowest-z average, fit a plane through
them by PCA, re-select inliers below the plane + threshold, repeat.

The labels land in column 6 of the per-frame ``lidar/{t:03d}.bin`` rows
(docs/prepare_data.md:150-163) and gate sky/ground handling downstream.
"""

from __future__ import annotations

import numpy as np

SEED_Z_MARGIN = 1.2      # th_seeds_: seed band above the lowest-point average
N_LOWEST = 20            # num_lpr_: lowest points averaged for the seed level
N_ITER = 10
PLANE_DIST = 0.3         # th_dist_: inlier distance to the fitted plane


def ground_label(points: np.ndarray) -> np.ndarray:
    """[N,>=3] vehicle-frame points -> [N] bool ground mask."""
    pts = np.asarray(points)[:, :3].astype(np.float64)
    n = pts.shape[0]
    if n < N_LOWEST:
        return np.zeros((n,), bool)

    z_sorted = np.sort(pts[:, 2])
    seed_level = z_sorted[:N_LOWEST].mean()
    inliers = pts[pts[:, 2] < seed_level + SEED_Z_MARGIN]

    mask = np.zeros((n,), bool)
    for _ in range(N_ITER):
        if inliers.shape[0] < 3:
            break
        mean = inliers.mean(0)
        cov = np.cov((inliers - mean).T)
        # plane normal = eigenvector of the smallest eigenvalue, oriented
        # upward (the reference keeps LAPACK's arbitrary sign, which can
        # flip the inequality below — a latent bug we don't reproduce)
        _, _, vt = np.linalg.svd(cov)
        normal = vt[2] if vt[2, 2] >= 0 else -vt[2]
        offset = -normal @ mean
        dist = pts @ normal
        mask = dist < (PLANE_DIST - offset)
        inliers = pts[mask]
    return mask
