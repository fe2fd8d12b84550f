"""cull_before_deform: with a conservative margin the culled fine-stage
render and its gradients match the full-pool path."""

import numpy as np
import jax
import jax.numpy as jnp

from s3gaussian_tpu.config import (ModelHiddenParams, OptimizationParams,
                                   PipelineParams, RasterConfig)
from s3gaussian_tpu.models.deformation import init_deformation
from s3gaussian_tpu.models.pool import create_from_pcd
from s3gaussian_tpu.render.renderer import render
from s3gaussian_tpu.train.trainer import compute_loss

from test_train_e2e import make_camera, small_hp
from scenes import random_scene

W = H = 48


def setup(seed=0, n=50):
    sc = random_scene(n=n, seed=seed, w=W, h=H, zrange=(2.0, 6.0),
                      scale_range=(0.1, 0.2))
    pts = sc["means"].copy()
    # a third of the points behind the camera / far off-frustum
    pts[::3, 2] = -5.0
    pool = create_from_pcd(pts, sc["colors"], 128)
    hp = small_hp()
    deform = init_deformation(jax.random.PRNGKey(1), hp)
    aabb = jnp.asarray([[8.0] * 3, [-8.0] * 3])
    rng = np.random.default_rng(7)
    gt = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    gtd = jnp.asarray(rng.uniform(1, 8, (H, W)), jnp.float32)
    cam = make_camera(sc, gt, gtd, time=0.3)
    return pool, deform, hp, aabb, cam


def cfg(cull):
    return RasterConfig(max_visible=128, rect_w=6, rect_h=6, chunk=16,
                        use_pallas=False, cull_before_deform=cull,
                        cull_margin_px=48.0)


def test_render_matches_full_path():
    pool, deform, hp, aabb, cam = setup()
    pipe = PipelineParams()
    bg = jnp.zeros(3)
    full = render(cam, pool, deform, hp, pipe, bg, aabb, 0, stage="fine",
                  return_dx=True, cfg=cfg(False))
    culled = render(cam, pool, deform, hp, pipe, bg, aabb, 0, stage="fine",
                    return_dx=True, cfg=cfg(True))
    np.testing.assert_allclose(np.asarray(culled["render"]),
                               np.asarray(full["render"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(culled["depth"]),
                               np.asarray(full["depth"]), atol=1e-4)
    # pool-shaped radii / visibility agree
    np.testing.assert_array_equal(np.asarray(culled["radii"]),
                                  np.asarray(full["radii"]))
    np.testing.assert_array_equal(
        np.asarray(culled["raster_aux"]["visible"]),
        np.asarray(full["raster_aux"]["visible"]))


def test_gradients_match_full_path():
    pool, deform, hp, aabb, cam = setup(seed=2)
    pipe = PipelineParams()
    opt = OptimizationParams()
    bg = jnp.zeros(3)
    params = {"pool": pool.param_dict(), "deform": deform}
    tap = jnp.zeros((pool.capacity, 2))

    def grads_for(cull):
        (loss, aux), g = jax.value_and_grad(
            compute_loss, argnums=(0, 1), has_aux=True)(
                params, tap, pool.alive, cam, "fine", 0, hp, opt, pipe,
                aabb, bg, cfg(cull), True)
        return float(loss), g

    lf, gf = grads_for(False)
    lc, gc = grads_for(True)
    assert abs(lf - lc) < 1e-5
    flat_f = jax.tree_util.tree_leaves(gf)
    flat_c = jax.tree_util.tree_leaves(gc)
    for a, b in zip(flat_f, flat_c):
        scale = max(float(jnp.abs(a).max()), 1e-8)
        # identical math, different reduction orders: absolute tolerance
        # floors at a few float32 ulps of the leaf's magnitude scale
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=max(3e-5 * scale, 3e-6), rtol=2e-3)
