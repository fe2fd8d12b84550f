"""Two-class pair emission (core 2×2 + budgeted periphery): output and
gradient parity with the single-class stream, and graceful demotion.

The two-class path (RasterConfig.big_budget > 0) must emit exactly the
same valid pair set as the single-class path while every big gaussian
gets a periphery slot; bigs beyond the budget fall back to their 2×2
core and are counted in overflow_rect."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s3gaussian_tpu.config import RasterConfig
from s3gaussian_tpu.ops.rasterizer import RasterSettings, rasterize

from scenes import random_scene


def setup(seed=0, n=60, w=48, h=48, tile=16, scale_lo=0.05, scale_hi=0.6):
    sc = random_scene(n=n, seed=seed, w=w, h=h)
    settings = RasterSettings(
        image_height=h, image_width=w, tanfovx=sc["tanfov"],
        tanfovy=sc["tanfov"], bg=jnp.asarray([0.1, 0.2, 0.3], jnp.float32),
        scale_modifier=1.0, viewmatrix=jnp.asarray(sc["view"]),
        projmatrix=jnp.asarray(sc["proj"]), sh_degree=0,
        campos=jnp.zeros(3))
    return sc, settings


def run(sc, settings, big_budget, rect=8, tile=16, **kw):
    cfg = RasterConfig(tile_x=tile, tile_y=tile, max_visible=256,
                       rect_w=rect, rect_h=rect, chunk=16,
                       big_budget=big_budget)
    return rasterize(
        settings, jnp.asarray(sc["means"]), jnp.asarray(sc["opacity"]),
        scales=jnp.asarray(sc["scales"]), rotations=jnp.asarray(sc["quats"]),
        colors_precomp=jnp.asarray(sc["colors"]), cfg=cfg, **kw)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_two_class_forward_matches_single_class(seed):
    sc, settings = setup(seed=seed)
    c0, r0, d0, aux0 = run(sc, settings, big_budget=0)
    c1, r1, d1, aux1 = run(sc, settings, big_budget=256)
    # full budget -> every big keeps its periphery: identical pair set
    assert int(aux1["n_pairs"]) == int(aux0["n_pairs"])
    assert int(aux1["overflow_rect"]) == int(aux0["overflow_rect"])
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0))


def test_two_class_gradients_match_single_class():
    sc, settings = setup(seed=3)
    tgt = jnp.asarray(np.random.default_rng(0).random((3, 48, 48)),
                      jnp.float32)

    def loss(means, scales, colors, opac, budget):
        cfg = RasterConfig(tile_x=16, tile_y=16, max_visible=256,
                           rect_w=8, rect_h=8, chunk=16, big_budget=budget)
        color, _, depth, _ = rasterize(
            settings, means, opac, scales=scales,
            rotations=jnp.asarray(sc["quats"]), colors_precomp=colors,
            cfg=cfg)
        return jnp.sum((color - tgt) ** 2) + 0.1 * jnp.sum(depth)

    args = (jnp.asarray(sc["means"]), jnp.asarray(sc["scales"]),
            jnp.asarray(sc["colors"]), jnp.asarray(sc["opacity"]))
    g0 = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, 0)
    g1 = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, 256)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_demotion_counts_and_stays_finite():
    sc, settings = setup(seed=4)
    sc = dict(sc)
    sc["scales"] = sc["scales"] * 3.0  # force several multi-tile rects
    _, _, _, aux_full = run(sc, settings, big_budget=256)
    c, r, d, aux = run(sc, settings, big_budget=1)
    # the scene has several bigs; with budget 1 the rest are demoted
    demoted = int(aux["overflow_rect"]) - int(aux_full["overflow_rect"])
    assert demoted > 0
    # demotion drops periphery pairs but never the cores
    assert int(aux["n_pairs"]) < int(aux_full["n_pairs"])
    assert int(aux["n_pairs"]) > 0
    assert np.isfinite(np.asarray(c)).all()


def test_all_small_scene_with_budget():
    # tiny splats only: no bigs; the periphery section is fully masked
    sc, settings = setup(seed=5)
    sc = dict(sc)
    sc["scales"] = sc["scales"] * 0.02
    c0, _, d0, aux0 = run(sc, settings, big_budget=0)
    c1, _, d1, aux1 = run(sc, settings, big_budget=64)
    assert int(aux1["n_pairs"]) == int(aux0["n_pairs"])
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0), atol=1e-6)
