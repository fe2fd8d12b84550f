"""Gradient correctness of the rasterizer.

Three layers of checking:
  1. the hand-written compositor VJP (the Pallas-math path) against plain
     JAX autodiff through the jnp compositor;
  2. finite differences on scene parameters end-to-end (through EWA
     projection, covariance, compositing, depth and background paths);
  3. the mean2d_tap gradient that feeds densification stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s3gaussian_tpu.config import RasterConfig
from s3gaussian_tpu.ops.rasterizer import RasterSettings, rasterize

from scenes import random_scene

CFG = RasterConfig(max_visible=128, rect_w=8, rect_h=8, chunk=16,
                   use_pallas=False)


def make_loss(sc, w=32, h=32, use_custom_vjp=True, bg=(0.3, 0.2, 0.1)):
    settings = RasterSettings(
        image_height=h, image_width=w, tanfovx=sc["tanfov"],
        tanfovy=sc["tanfov"], bg=jnp.asarray(bg, jnp.float32),
        scale_modifier=1.0, viewmatrix=jnp.asarray(sc["view"]),
        projmatrix=jnp.asarray(sc["proj"]), sh_degree=0, campos=jnp.zeros(3))
    key = jax.random.PRNGKey(7)
    tgt_c = jax.random.uniform(key, (3, h, w))
    tgt_d = jax.random.uniform(jax.random.fold_in(key, 1), (h, w)) * 5

    def loss(means, scales, quats, opacity, colors, tap):
        color, radii, depth, aux = rasterize(
            settings, means, opacity, scales=scales, rotations=quats,
            colors_precomp=colors, mean2d_tap=tap, cfg=CFG,
            use_custom_vjp=use_custom_vjp)
        return (jnp.mean(jnp.abs(color - tgt_c))
                + 0.3 * jnp.mean((depth - tgt_d) ** 2))

    return loss


def scene_args(sc):
    tap = jnp.zeros((sc["means"].shape[0], 2))
    return (jnp.asarray(sc["means"]), jnp.asarray(sc["scales"]),
            jnp.asarray(sc["quats"]), jnp.asarray(sc["opacity"]),
            jnp.asarray(sc["colors"]), tap)


def test_custom_vjp_matches_autodiff():
    sc = random_scene(n=40, seed=11, w=32, h=32)
    args = scene_args(sc)
    g_custom = jax.grad(make_loss(sc, use_custom_vjp=True),
                        argnums=(0, 1, 2, 3, 4, 5))(*args)
    g_auto = jax.grad(make_loss(sc, use_custom_vjp=False),
                      argnums=(0, 1, 2, 3, 4, 5))(*args)
    names = ["means", "scales", "quats", "opacity", "colors", "tap"]
    for n, gc, ga in zip(names, g_custom, g_auto):
        scale = np.maximum(np.abs(np.asarray(ga)).max(), 1e-8)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(ga),
                                   atol=2e-5 * scale, rtol=2e-4,
                                   err_msg=f"grad mismatch for {n}")


@pytest.mark.parametrize("argnum,name", [(0, "means"), (1, "scales"),
                                         (3, "opacity"), (4, "colors")])
def test_finite_differences(argnum, name):
    sc = random_scene(n=12, seed=3, w=32, h=32,
                      opacity_range=(0.3, 0.7))
    args = list(scene_args(sc))
    loss = make_loss(sc, use_custom_vjp=True)
    g = jax.grad(loss, argnums=argnum)(*args)
    g = np.asarray(g)

    rng = np.random.default_rng(0)
    x0 = np.asarray(args[argnum], np.float64)
    flat = x0.reshape(-1)
    # probe the 8 largest-gradient coordinates + 2 random ones.
    # Rasterization is only piecewise smooth (tile-rect membership, the
    # alpha<1/255 and T<1e-4 cutoffs are discrete), so individual probes
    # can land on a kink — require a large majority to agree instead of
    # every single one.
    idx = np.argsort(-np.abs(g).reshape(-1))[:8].tolist()
    idx += rng.integers(0, flat.size, 2).tolist()
    eps = 1e-3
    ok = 0
    fails = []
    for i in idx:
        xp = flat.copy(); xp[i] += eps
        xm = flat.copy(); xm[i] -= eps
        ap = list(args); ap[argnum] = jnp.asarray(xp.reshape(x0.shape), jnp.float32)
        am = list(args); am[argnum] = jnp.asarray(xm.reshape(x0.shape), jnp.float32)
        fd = (float(loss(*ap)) - float(loss(*am))) / (2 * eps)
        gi = g.reshape(-1)[i]
        tol = max(3e-2 * max(abs(fd), abs(gi)), 3e-4)
        if abs(fd - gi) < tol:
            ok += 1
        else:
            fails.append(f"{name}[{i}]: fd={fd:.6g} grad={gi:.6g}")
    assert ok >= len(idx) - 2, f"too many FD mismatches: {fails}"


def test_tap_gradient_is_ndc_screen_gradient():
    """The mean2d_tap grad must equal the gradient w.r.t. the NDC screen
    position (what the reference accumulates for densify stats with the
    0.5*W scaling, backward.cu:578-580)."""
    sc = random_scene(n=20, seed=5, w=32, h=32)
    args = scene_args(sc)
    g_tap = jax.grad(make_loss(sc), argnums=5)(*args)
    g_tap = np.asarray(g_tap)
    vis_rows = np.abs(g_tap).sum(1) > 0
    assert vis_rows.sum() > 5  # most gaussians visible and contributing
    assert np.isfinite(g_tap).all()
