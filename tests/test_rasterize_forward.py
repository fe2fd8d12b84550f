"""Forward rasterization against the brute-force numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from s3gaussian_tpu.config import RasterConfig
from s3gaussian_tpu.ops.rasterizer import RasterSettings, rasterize

from brute import render_brute
from scenes import random_scene, cov3d_np


def run_pair(seed, bg, n=60, w=48, h=48, tile=16, tight=True, **scene_kw):
    """tight=True: both path and oracle use the alpha-threshold rect (the
    default); tight=False cross-checks the reference's circle-rect mode."""
    sc = random_scene(n=n, seed=seed, w=w, h=h, **scene_kw)
    cov = cov3d_np(sc["scales"], sc["quats"])
    want = render_brute(sc["means"].astype(np.float64), cov.astype(np.float64),
                        sc["colors"], sc["opacity"], sc["view"], sc["proj"],
                        sc["tanfov"], sc["tanfov"], w, h, np.asarray(bg),
                        tile_x=tile, tile_y=tile, tight_rect=tight)
    settings = RasterSettings(
        image_height=h, image_width=w, tanfovx=sc["tanfov"],
        tanfovy=sc["tanfov"], bg=jnp.asarray(bg, jnp.float32),
        scale_modifier=1.0, viewmatrix=jnp.asarray(sc["view"]),
        projmatrix=jnp.asarray(sc["proj"]), sh_degree=0,
        campos=jnp.zeros(3))
    cfg = RasterConfig(tile_x=tile, tile_y=tile, max_visible=256,
                       rect_w=8, rect_h=8, chunk=16, tight_rect=tight)
    color, radii, depth, aux = rasterize(
        settings, jnp.asarray(sc["means"]), jnp.asarray(sc["opacity"]),
        scales=jnp.asarray(sc["scales"]), rotations=jnp.asarray(sc["quats"]),
        colors_precomp=jnp.asarray(sc["colors"]), cfg=cfg)
    return want, np.asarray(color), np.asarray(depth), np.asarray(radii), aux


@pytest.mark.parametrize("seed,bg", [(0, [0, 0, 0]), (1, [1, 1, 1]),
                                     (2, [0.2, 0.5, 0.9])])
def test_forward_matches_brute(seed, bg):
    want, color, depth, radii, aux = run_pair(seed, bg)
    assert int(aux["overflow_rect"]) == 0
    np.testing.assert_allclose(color, want["render"], atol=2e-3)
    np.testing.assert_allclose(depth, want["depth"], atol=5e-3)


@pytest.mark.parametrize("seed,bg", [(0, [0, 0, 0]), (2, [0.2, 0.5, 0.9])])
def test_forward_matches_brute_circle_rect(seed, bg):
    # reference-parity mode: circumscribed 3σ circle rect on both sides
    want, color, depth, radii, aux = run_pair(seed, bg, tight=False)
    assert int(aux["overflow_rect"]) == 0
    np.testing.assert_allclose(color, want["render"], atol=2e-3)
    np.testing.assert_allclose(depth, want["depth"], atol=5e-3)


def test_radii_match_brute():
    want, color, depth, radii, aux = run_pair(3, [0, 0, 0])
    pr = want["proj"]
    exp = np.where(pr["visible"], pr["radius"], 0).astype(np.int32)
    np.testing.assert_array_equal(radii, exp)


def test_visibility_and_counts():
    want, color, depth, radii, aux = run_pair(4, [0, 0, 0])
    pr = want["proj"]
    assert int(aux["n_visible"]) == int(pr["visible"].sum())
    assert int(aux["overflow_visible"]) == 0


def test_behind_camera_culled():
    sc = random_scene(n=10, seed=5)
    means = sc["means"].copy()
    means[:, 2] = -2.0  # all behind camera
    settings = RasterSettings(
        image_height=48, image_width=48, tanfovx=sc["tanfov"],
        tanfovy=sc["tanfov"], bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=jnp.asarray(sc["view"]), projmatrix=jnp.asarray(sc["proj"]),
        sh_degree=0, campos=jnp.zeros(3))
    cfg = RasterConfig(max_visible=64, rect_w=4, rect_h=4, chunk=16)
    color, radii, depth, aux = rasterize(
        settings, jnp.asarray(means), jnp.asarray(sc["opacity"]),
        scales=jnp.asarray(sc["scales"]), rotations=jnp.asarray(sc["quats"]),
        colors_precomp=jnp.asarray(sc["colors"]), cfg=cfg)
    assert int(aux["n_visible"]) == 0
    np.testing.assert_allclose(np.asarray(color), 0.0, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(radii), 0)


def test_nonsquare_image_and_odd_size():
    # image size not a multiple of the tile exercises the crop path
    want, color, depth, radii, aux = run_pair(6, [0, 0, 0], n=40, w=40, h=56)
    np.testing.assert_allclose(color, want["render"], atol=2e-3)


def test_full_resolution_two_key_path():
    """Waymo full-res 1280x1920 = 9,600 tiles — beyond the packed 12-bit
    tile field, so the binner must switch to the two-key (tile, depth) sort
    (the reference's 64-bit keys handle any resolution,
    rasterizer_impl.cu:290-309).  Compares against the brute oracle."""
    from s3gaussian_tpu.ops.binning import DEPTH_BITS

    h, w, tile = 1280, 1920, 16
    n_tiles = (h // tile) * (w // tile)
    assert n_tiles >= (1 << (32 - DEPTH_BITS)) - 1  # really the two-key path
    # world scales small enough that every splat's tile rect fits the 8x8
    # cap at this focal length (the cap-overflow behavior has its own test)
    want, color, depth, radii, aux = run_pair(
        7, [0.1, 0.3, 0.2], n=40, w=w, h=h,
        zrange=(3.0, 10.0), scale_range=(0.004, 0.02))
    assert int(aux["overflow_rect"]) == 0
    assert int(aux["overflow_pairs"]) == 0
    np.testing.assert_allclose(color, want["render"], atol=2e-3)
    np.testing.assert_allclose(depth, want["depth"], atol=5e-3)
