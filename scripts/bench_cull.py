#!/usr/bin/env python
"""Measure cull_before_deform on a realistic-visibility workload.

The headline bench constructs an all-visible pool (every Gaussian inside
the frustum), where pre-deformation culling cannot help by construction.
Real street scenes see ~30-50% of the pool per camera (three cameras
cover ~130° of a 360° point cloud).  This benchmark builds such a wide
scene — pool spread around the ego, one forward camera — and measures
fine-stage train it/s with the cull off vs on.

    python scripts/bench_cull.py [--n 400000] [--steps 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=400_000)
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--max_visible", type=int, default=1 << 18,
                   help="render/candidate budget; size it to the workload's "
                        "visible count - the culled path deforms exactly "
                        "this many candidate rows")
    args = p.parse_args(argv)

    import jax
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.jax_cache_bench"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import dataclasses
    import jax.numpy as jnp

    from s3gaussian_tpu.config import (ModelHiddenParams, OptimizationParams,
                                       PipelineParams, RasterConfig)
    from s3gaussian_tpu.data.cameras import Camera
    from s3gaussian_tpu.models.deformation import init_deformation
    from s3gaussian_tpu.models.pool import create_from_pcd
    from s3gaussian_tpu.ops.transforms import projection_matrix
    from s3gaussian_tpu.train.trainer import init_state, train_step

    H, W, N = 640, 960, args.n
    CAP = -(-N // 2048) * 2048
    rng = np.random.default_rng(0)
    # 360-degree street-like cloud around the ego: only the +z frustum
    # sliver is visible to the forward camera
    ang = rng.uniform(-np.pi, np.pi, N)
    r = rng.uniform(2.0, 70.0, N)
    pts = np.stack([np.sin(ang) * r,
                    rng.uniform(-3.0, 12.0, N),
                    np.cos(ang) * r], 1).astype(np.float32)
    cols = rng.random((N, 3)).astype(np.float32)
    pool = create_from_pcd(pts, cols, CAP)

    hp = ModelHiddenParams()
    opt = OptimizationParams()
    pipe = PipelineParams()
    deform = init_deformation(jax.random.PRNGKey(0), hp)
    aabb = jnp.asarray([[80.0, 80.0, 80.0], [-80.0, -80.0, -80.0]])
    view = np.eye(4, dtype=np.float32)
    prm = projection_matrix(0.01, 100.0, 1.0, 1.0)
    full = (view.T @ prm.T).astype(np.float32)
    gt = rng.random((H, W, 3)).astype(np.float32)
    gt_depth = rng.uniform(1, 70, (H, W)).astype(np.float32)
    cam = Camera(world_view=jnp.asarray(view), full_proj=jnp.asarray(full),
                 campos=jnp.zeros(3), time=jnp.asarray(0.4, jnp.float32),
                 image=jnp.asarray(gt), depth_map=jnp.asarray(gt_depth),
                 image_height=H, image_width=W, fovx=1.0, fovy=1.0)
    bg = jnp.zeros(3)

    def sync(st):
        return float(jnp.sum(st.pool.xyz[:8]))

    results = {}
    for cull in (False, True):
        cfg = RasterConfig(tile_x=16, tile_y=16, max_visible=args.max_visible,
                           rect_w=4, rect_h=4, pair_budget=1 << 22,
                           cull_before_deform=cull)
        state = init_state(pool, deform, aabb)
        state, aux = train_step(state, cam, "fine", 3, hp, opt, pipe, cfg,
                                30.0, bg)
        sync(state)
        t0 = time.time()
        for _ in range(args.steps):
            state, aux = train_step(state, cam, "fine", 3, hp, opt, pipe,
                                    cfg, 30.0, bg)
        sync(state)
        it_s = args.steps / (time.time() - t0)
        results["cull_on" if cull else "cull_off"] = {
            "it_per_s": round(it_s, 3),
            "n_visible": int(jnp.sum(aux["visible"])),
            "n_pairs": int(aux["n_pairs"]),
            "overflow_pairs": int(aux["overflow_pairs"]),
            "loss": round(float(aux["metrics"]["loss"]), 6),
        }
    results["visible_frac"] = round(
        results["cull_off"]["n_visible"] / N, 3)
    results["speedup"] = round(results["cull_on"]["it_per_s"]
                               / results["cull_off"]["it_per_s"], 3)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
