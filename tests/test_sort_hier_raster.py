"""End-to-end parity: rasterize with the hierarchical pair sort
(RasterConfig.sort_hier > 0) must be BIT-identical to the lax.sort path —
forward outputs and gradients — because the sorted order is the same
total order (key, then unique slot).  Small chunk_log2 forces the full
merge hierarchy even at test sizes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s3gaussian_tpu.config import RasterConfig
from s3gaussian_tpu.ops.rasterizer import RasterSettings, rasterize

from scenes import random_scene


def setup(seed=0, n=200, w=64, h=48):
    sc = random_scene(n=n, seed=seed, w=w, h=h)
    settings = RasterSettings(
        image_height=h, image_width=w, tanfovx=sc["tanfov"],
        tanfovy=sc["tanfov"], bg=jnp.asarray([0.1, 0.2, 0.3], jnp.float32),
        scale_modifier=1.0, viewmatrix=jnp.asarray(sc["view"]),
        projmatrix=jnp.asarray(sc["proj"]), sh_degree=0,
        campos=jnp.zeros(3))
    return sc, settings


def run(sc, settings, sort_hier, **kw):
    cfg = RasterConfig(tile_x=16, tile_y=16, max_visible=256,
                       rect_w=4, rect_h=4, chunk=16, sort_hier=sort_hier)
    return rasterize(
        settings, jnp.asarray(sc["means"]), jnp.asarray(sc["opacity"]),
        scales=jnp.asarray(sc["scales"]), rotations=jnp.asarray(sc["quats"]),
        colors_precomp=jnp.asarray(sc["colors"]), cfg=cfg, **kw)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("chunk_log2", [7, 9])
def test_forward_bit_identical(seed, chunk_log2):
    sc, settings = setup(seed=seed)
    c0, r0, d0, aux0 = run(sc, settings, sort_hier=0)
    c1, r1, d1, aux1 = run(sc, settings, sort_hier=chunk_log2)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r0))
    assert int(aux1["n_pairs"]) == int(aux0["n_pairs"])


def test_gradients_bit_identical():
    sc, settings = setup(seed=2)
    tgt = jnp.asarray(np.random.default_rng(0).random((3, 48, 64)),
                      jnp.float32)

    def loss(means, scales, colors, opac, sort_hier):
        cfg = RasterConfig(tile_x=16, tile_y=16, max_visible=256,
                           rect_w=4, rect_h=4, chunk=16,
                           sort_hier=sort_hier)
        c, _, _, _ = rasterize(settings, means, opac, scales=scales,
                               rotations=jnp.asarray(sc["quats"]),
                               colors_precomp=colors, cfg=cfg)
        return jnp.abs(c - tgt).mean()

    args = (jnp.asarray(sc["means"]), jnp.asarray(sc["scales"]),
            jnp.asarray(sc["colors"]), jnp.asarray(sc["opacity"]))
    g0 = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, 0)
    g1 = jax.grad(loss, argnums=(0, 1, 2, 3))(*args, 8)
    for a, b in zip(g1, g0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_two_key_path_bit_identical():
    # >4094 tiles forces the (tile, depth) two-key representation
    sc, settings = setup(seed=3, n=120, w=1024, h=1024)
    c0, _, d0, _ = run(sc, settings, sort_hier=0)
    c1, _, d1, _ = run(sc, settings, sort_hier=9)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
