"""Pallas tile kernels (interpret mode on CPU) vs the jnp oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from s3gaussian_tpu.ops import composite as comp
from s3gaussian_tpu.ops import tile_kernels as tk
from s3gaussian_tpu.ops.binning import bin_gaussians
from s3gaussian_tpu.ops.project import build_cov3d, project_gaussians

from scenes import random_scene

W = H = 64
TILE = 16
GX = GY = 4
CHUNK = 16


def binned_scene(seed=0, n=70, opacity_range=(0.2, 0.95)):
    sc = random_scene(n=n, seed=seed, w=W, h=H, opacity_range=opacity_range)
    cov = build_cov3d(jnp.asarray(sc["scales"]), jnp.asarray(sc["quats"]))
    proj = project_gaussians(jnp.asarray(sc["means"]), cov,
                             jnp.asarray(sc["view"]), jnp.asarray(sc["proj"]),
                             sc["tanfov"], sc["tanfov"], W, H, TILE, TILE)
    b = bin_gaussians(proj, GX, GY, max_visible=128, rect_w=8, rect_h=8,
                      tile_x=TILE, tile_y=TILE)
    feat_pool = comp.pack_pool_features(proj.xy, proj.conic,
                                        jnp.asarray(sc["opacity"]),
                                        jnp.asarray(sc["colors"]), proj.depth)
    pair_idx = b.sel[b.sorted_gid]
    pair_feat = feat_pool[:, pair_idx]
    return pair_feat, b


def test_forward_kernel_matches_jnp():
    for seed in (0, 1):
        pair_feat, b = binned_scene(seed)
        max_chunks = -(-pair_feat.shape[1] // CHUNK)
        want = comp.composite_tiles_jnp(pair_feat, b.tile_starts, GX, GY,
                                        TILE, TILE, CHUNK, max_chunks)
        got = tk.composite_fwd_pallas(pair_feat, b.tile_starts, GX, GY,
                                      TILE, TILE, CHUNK)
        want, got = np.asarray(want), np.asarray(got)
        # rgbd rows: tight; final_T may differ by the early-exit freeze
        np.testing.assert_allclose(got[:, 0:4], want[:, 0:4],
                                   atol=5e-4, rtol=1e-4)
        np.testing.assert_allclose(got[:, 4], want[:, 4], atol=2e-4)
        np.testing.assert_allclose(got[:, 5], want[:, 5], atol=1.0)


def test_forward_kernel_high_opacity_early_exit():
    # near-opaque gaussians saturate T quickly and exercise the early exit
    pair_feat, b = binned_scene(2, n=120, opacity_range=(0.9, 0.99))
    max_chunks = -(-pair_feat.shape[1] // CHUNK)
    want = comp.composite_tiles_jnp(pair_feat, b.tile_starts, GX, GY,
                                    TILE, TILE, CHUNK, max_chunks)
    got = tk.composite_fwd_pallas(pair_feat, b.tile_starts, GX, GY,
                                  TILE, TILE, CHUNK)
    np.testing.assert_allclose(np.asarray(got)[:, 0:4],
                               np.asarray(want)[:, 0:4], atol=5e-4, rtol=1e-4)


def test_cumsum_lane_blocked_matches_jnp():
    # chunk > 128 engages the blocked tri-matmul path with carries
    x = np.random.default_rng(0).normal(size=(8, 384)).astype(np.float32)
    got = np.asarray(tk._cumsum_lane(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.cumsum(x, axis=1), rtol=2e-5,
                               atol=2e-5)


def test_kernels_chunk_256_match_jnp():
    pair_feat, b = binned_scene(1)
    chunk = 256
    max_chunks = -(-pair_feat.shape[1] // chunk)
    want = comp.composite_tiles_jnp(pair_feat, b.tile_starts, GX, GY,
                                    TILE, TILE, chunk, max_chunks)
    got = tk.composite_fwd_pallas(pair_feat, b.tile_starts, GX, GY,
                                  TILE, TILE, chunk)
    np.testing.assert_allclose(np.asarray(got)[:, 0:4],
                               np.asarray(want)[:, 0:4], atol=5e-4, rtol=1e-4)
    dout = jax.random.normal(jax.random.PRNGKey(1), want.shape)
    dout = dout.at[:, 5:].set(0.0)
    want_g = comp.composite_tiles_bwd_jnp(pair_feat, b.tile_starts, want,
                                          dout, GX, GY, TILE, TILE, chunk,
                                          max_chunks)
    got_g = tk.composite_bwd_pallas(pair_feat, b.tile_starts, want, dout,
                                    GX, GY, TILE, TILE, chunk)
    want_g, got_g = np.asarray(want_g), np.asarray(got_g)
    n_pairs = int(b.n_pairs)
    scale = max(np.abs(want_g[:, :n_pairs]).max(), 1e-6)
    np.testing.assert_allclose(got_g[:, :n_pairs], want_g[:, :n_pairs],
                               atol=1e-5 * scale, rtol=1e-4)


def test_backward_kernel_matches_jnp():
    for seed, op in ((0, (0.2, 0.95)), (3, (0.85, 0.99))):
        pair_feat, b = binned_scene(seed, opacity_range=op)
        max_chunks = -(-pair_feat.shape[1] // CHUNK)
        out = comp.composite_tiles_jnp(pair_feat, b.tile_starts, GX, GY,
                                       TILE, TILE, CHUNK, max_chunks)
        key = jax.random.PRNGKey(seed)
        dout = jax.random.normal(key, out.shape)
        # zero cotangent for n_contrib / pad rows (non-differentiable)
        dout = dout.at[:, 5:].set(0.0)
        want = comp.composite_tiles_bwd_jnp(pair_feat, b.tile_starts, out,
                                            dout, GX, GY, TILE, TILE, CHUNK,
                                            max_chunks)
        got = tk.composite_bwd_pallas(pair_feat, b.tile_starts, out, dout,
                                      GX, GY, TILE, TILE, CHUNK)
        want, got = np.asarray(want), np.asarray(got)
        n_pairs = int(b.n_pairs)
        scale = max(np.abs(want[:, :n_pairs]).max(), 1e-6)
        np.testing.assert_allclose(got[:, :n_pairs], want[:, :n_pairs],
                                   atol=1e-5 * scale, rtol=1e-4)
