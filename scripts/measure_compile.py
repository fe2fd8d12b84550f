#!/usr/bin/env python
"""Measure where the train-step cold-compile time goes.

Times trace (jit lowering), XLA compile, for the scanned train-step
program at several scan lengths, with a FRESH compilation cache dir, so
the numbers are true cold-compile costs.  Usage:

    python scripts/measure_compile.py [scan_n ...]

Prints one line per configuration:  scan_n, trace_s, compile_s.
"""

import os
import sys
import tempfile
import time


def main():
    scan_ns = [int(a) for a in sys.argv[1:]] or [1, 10]

    cache = tempfile.mkdtemp(prefix="jaxcache_cold_")
    os.environ["JAX_COMPILATION_CACHE_DIR"] = cache

    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir", cache)
    import jax.numpy as jnp
    import dataclasses as dc

    from s3gaussian_tpu.config import (ModelHiddenParams, OptimizationParams,
                                       PipelineParams, RasterConfig)
    from s3gaussian_tpu.data.cameras import Camera, stack_cameras
    from s3gaussian_tpu.models.deformation import init_deformation
    from s3gaussian_tpu.models.pool import create_from_pcd
    from s3gaussian_tpu.ops.transforms import projection_matrix
    from s3gaussian_tpu.train.trainer import init_state, train_steps_scan

    H, W = 640, 960
    N = 200_000
    CAP = 204_800
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
    cfg = RasterConfig(tile_x=16, tile_y=16, max_visible=CAP,
                       rect_w=4, rect_h=4, pair_budget=1 << 22, chunk=128)
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

    for n in scan_ns:
        cams = stack_cameras(
            [dc.replace(cam, time=jnp.asarray(0.4 + 1e-4 * i, jnp.float32))
             for i in range(n)])
        t0 = time.time()
        lowered = train_steps_scan.lower(state, cams, "fine", 3, hp, opt,
                                         pipe, cfg, 30.0, bg)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        print(f"scan_n={n:3d}  trace={t1-t0:7.1f}s  compile={t2-t1:7.1f}s",
              flush=True)
        del lowered, compiled


if __name__ == "__main__":
    main()
