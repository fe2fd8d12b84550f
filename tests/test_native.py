"""Native C++ data-plane kernels vs their numpy oracles."""

import numpy as np
import pytest

from s3gaussian_tpu import native
from s3gaussian_tpu.ops.knn import mean_knn_dist2

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_knn_matches_numpy_windowed():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2000, 3)).astype(np.float32)
    want = mean_knn_dist2(pts, k=3, window=32)  # numpy path (n<=4096)
    got = native.knn_mean_dist2(pts, k=3, window=32)
    # both are morton-window approximations with the same window; equal
    # morton codes may sort in different orders, shifting a few windows
    rel = np.abs(got - want) / np.maximum(want, 1e-9)
    assert (rel < 1e-5).mean() > 0.99
    assert np.median(rel) < 1e-7


def test_knn_against_exact_small():
    """The morton-window search is approximate (like the reference's
    simple-knn box rejection): sizes only seed the initial log-scale, so we
    require the estimate to be exact for most points and never to
    *under*-estimate (a window miss can only inflate the distance)."""
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    got = native.knn_mean_dist2(pts, k=3, window=64)
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1) ** 2
    np.fill_diagonal(d, np.inf)
    d.sort(axis=1)
    exact = d[:, :3].mean(axis=1)
    rel = np.abs(got - exact) / np.maximum(exact, 1e-9)
    assert (rel < 1e-4).mean() > 0.6
    assert (got >= exact - 1e-6).all()
    # and within an order of magnitude everywhere
    assert (got < exact * 10 + 1e-6).all()


def test_lidar_depth_matches_numpy():
    rng = np.random.default_rng(2)
    pts = np.stack([rng.uniform(-5, 5, 5000), rng.uniform(-5, 5, 5000),
                    rng.uniform(1, 30, 5000)], 1).astype(np.float32)
    w2c = np.eye(4, dtype=np.float32)
    K = np.array([[100, 0, 48], [0, 100, 32], [0, 0, 1]], np.float32)
    h, w = 64, 96
    got = native.lidar_depth_map(pts, w2c, K, h, w)

    want = np.zeros((h, w), np.float32)
    cam = pts  # identity w2c
    pix = (K @ cam.T).T
    front = pix[:, 2] > 0
    pix = pix[front]
    uv = pix[:, :2] / pix[:, 2:]
    ok = (uv[:, 0] >= 0) & (uv[:, 0] < w) & (uv[:, 1] >= 0) & (uv[:, 1] < h)
    pix, uv = pix[ok], uv[ok]
    want[uv[:, 1].astype(int), uv[:, 0].astype(int)] = pix[:, 2]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_voxel_dedup_matches_numpy():
    from s3gaussian_tpu.data.waymo import grid_sample_3d
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(3000, 3)).astype(np.float32) * 0.05
    cols = rng.random((3000, 3)).astype(np.float32)
    want_p, _ = grid_sample_3d(pts, cols, voxel_size=0.013)
    keep = native.voxel_dedup(pts, voxel=0.013)
    got_p = pts[keep]
    # one representative per voxel; which point represents a voxel is
    # tie-broken differently (numpy argsort is unstable too), so compare
    # the voxel sets
    assert len(got_p) == len(want_p)

    def vox(p):
        q = np.around(p / 0.013).astype(np.int64)
        return set(map(tuple, q))

    assert vox(got_p) == vox(want_p)
