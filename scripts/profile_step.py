#!/usr/bin/env python
"""Full train-step component profile on the bench workload: deformation,
raster forward, full value_and_grad, Adam — so optimization effort follows
the measured breakdown rather than the rasterizer-only view.

    python scripts/profile_step.py [--steps 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--cap", type=int, default=1 << 18)
    args = p.parse_args(argv)

    import jax
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.jax_cache_bench"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from s3gaussian_tpu.config import (ModelHiddenParams, OptimizationParams,
                                       PipelineParams, RasterConfig)
    from s3gaussian_tpu.data.cameras import Camera
    from s3gaussian_tpu.models.deformation import (apply_deformation,
                                                   init_deformation)
    from s3gaussian_tpu.models.pool import create_from_pcd
    from s3gaussian_tpu.ops.transforms import projection_matrix
    from s3gaussian_tpu.render.renderer import render
    from s3gaussian_tpu.train.losses import l1_loss, ssim, depth_loss
    from s3gaussian_tpu.train.trainer import compute_loss, init_state, train_step

    H, W, N, CAP = 640, 960, args.n, args.cap
    rng = np.random.default_rng(0)
    tan = np.tan(0.5)
    z = rng.uniform(1.0, 60.0, N)
    pts = np.stack([rng.uniform(-0.9, 0.9, N) * tan * z,
                    rng.uniform(-0.9, 0.9, N) * tan * z, z], 1).astype(np.float32)
    cols = rng.random((N, 3)).astype(np.float32)
    pool = create_from_pcd(pts, cols, CAP)
    hp = ModelHiddenParams()
    opt = OptimizationParams()
    pipe = PipelineParams()
    cfg = RasterConfig(tile_x=16, tile_y=16, max_visible=1 << 18,
                       rect_w=4, rect_h=4, pair_budget=1 << 22)
    deform = init_deformation(jax.random.PRNGKey(0), hp)
    aabb = jnp.asarray([[80.0, 80.0, 80.0], [-80.0, -80.0, -10.0]])
    state = init_state(pool, deform, aabb)
    view = np.eye(4, dtype=np.float32)
    proj = projection_matrix(0.01, 100.0, 1.0, 1.0)
    full = (view.T @ proj.T).astype(np.float32)
    gt = rng.random((H, W, 3)).astype(np.float32)
    gt_depth = rng.uniform(1, 70, (H, W)).astype(np.float32)
    cam = Camera(world_view=jnp.asarray(view), full_proj=jnp.asarray(full),
                 campos=jnp.zeros(3), time=jnp.asarray(0.4, jnp.float32),
                 image=jnp.asarray(gt), depth_map=jnp.asarray(gt_depth),
                 image_height=H, image_width=W, fovx=1.0, fovy=1.0)
    bg = jnp.zeros(3)

    def timed(name, fn, *xs, steps=args.steps):
        f = jax.jit(fn)
        r = f(*xs)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32).ravel()[:4]))
        t0 = time.perf_counter()
        outs = [f(*xs) for _ in range(steps)]
        for o in outs:
            float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32).ravel()[:4]))
        dt = (time.perf_counter() - t0) / steps * 1e3
        print(f"{name:>28}: {dt:8.2f} ms")

    # deformation forward
    t = jnp.full((CAP, 1), 0.4)
    shs = jnp.concatenate([pool.features_dc, pool.features_rest], 1)
    timed("deform fwd", lambda d, xyz: apply_deformation(
        d, hp, aabb, xyz, pool.scaling, pool.rotation, pool.opacity,
        shs, t).xyz, deform, pool.xyz)

    def deform_loss(d, xyz):
        out = apply_deformation(d, hp, aabb, xyz, pool.scaling,
                                pool.rotation, pool.opacity, shs, t)
        return jnp.sum(out.xyz) + jnp.sum(out.shs)

    timed("deform fwd+bwd", lambda d, xyz: jax.grad(
        deform_loss, argnums=(0, 1))(d, xyz), deform, pool.xyz)

    # full fine render forward
    timed("render fwd (fine)", lambda xyz: render(
        cam, pool.with_params({**pool.param_dict(), "xyz": xyz}), deform,
        hp, pipe, bg, aabb, 3, stage="fine", cfg=cfg)["render"], pool.xyz)

    # loss fwd+bwd (the heart of train_step)
    params = {"pool": pool.param_dict(), "deform": deform}
    tap = jnp.zeros((CAP, 2))

    def vg(params, tap):
        return jax.value_and_grad(compute_loss, argnums=(0, 1), has_aux=True)(
            params, tap, pool.alive, cam, "fine", 3, hp, opt, pipe, aabb, bg,
            cfg, True)

    timed("value_and_grad", vg, params, tap)

    # ssim alone on [3,H,W]
    img = jnp.asarray(rng.random((3, H, W)), jnp.float32)
    img2 = jnp.asarray(rng.random((3, H, W)), jnp.float32)
    timed("ssim", ssim, img, img2)
    timed("full train_step", lambda s: train_step(
        s, cam, "fine", 3, hp, opt, pipe, cfg, 30.0, bg)[0].pool.xyz, state)


if __name__ == "__main__":
    main()
