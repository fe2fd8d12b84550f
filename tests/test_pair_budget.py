"""Static pair budget: truncation is reported and the image degrades
gracefully (only the farthest pairs of the highest tiles drop)."""

import numpy as np
import jax.numpy as jnp

from s3gaussian_tpu.config import RasterConfig
from s3gaussian_tpu.ops.rasterizer import RasterSettings, rasterize

from scenes import random_scene


def run(budget):
    sc = random_scene(n=60, seed=0, w=48, h=48)
    settings = RasterSettings(
        image_height=48, image_width=48, tanfovx=sc["tanfov"],
        tanfovy=sc["tanfov"], bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=jnp.asarray(sc["view"]), projmatrix=jnp.asarray(sc["proj"]),
        sh_degree=0, campos=jnp.zeros(3))
    cfg = RasterConfig(max_visible=128, rect_w=6, rect_h=6, chunk=16,
                       pair_budget=budget, use_pallas=False)
    return rasterize(settings, jnp.asarray(sc["means"]),
                     jnp.asarray(sc["opacity"]), scales=jnp.asarray(sc["scales"]),
                     rotations=jnp.asarray(sc["quats"]),
                     colors_precomp=jnp.asarray(sc["colors"]), cfg=cfg)


def test_budget_overflow_reported_and_bounded():
    color_full, _, _, aux_full = run(1 << 22)
    n_pairs = int(aux_full["n_pairs"])
    assert int(aux_full.get("overflow_pairs", 0)) == 0

    budget = max(n_pairs // 2, 16)
    color_cut, _, _, aux_cut = run(budget)
    assert int(aux_cut["overflow_pairs"]) == n_pairs - int(aux_cut["n_pairs"])
    assert int(aux_cut["n_pairs"]) <= budget
    # earlier tiles unaffected: some pixels identical
    same = np.isclose(np.asarray(color_cut), np.asarray(color_full),
                      atol=1e-6).all(axis=0)
    assert same.mean() > 0.3
