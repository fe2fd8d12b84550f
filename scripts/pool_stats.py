#!/usr/bin/env python
"""Screen-space workload statistics for a gaussian pool: projects the pool
with a bench-style camera and reports the per-gaussian tile-rect
distribution (the quantity that sets rasterizer pair load).

Used to audit how closely bench.py's synthetic workload matches the
screen-size distribution of a converged real training run (mini_clip).

    python scripts/pool_stats.py --ply <point_cloud.ply>     # converged run
    python scripts/pool_stats.py --bench                     # bench scene
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--h", type=int, default=640)
    ap.add_argument("--w", type=int, default=960)
    args = ap.parse_args(argv)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    from s3gaussian_tpu.ops.project import build_cov3d, project_gaussians
    from s3gaussian_tpu.ops.transforms import projection_matrix

    if args.bench:
        from s3gaussian_tpu.models.pool import create_from_pcd
        rng = np.random.default_rng(0)
        N = 200_000
        tan = np.tan(0.5)
        z = rng.uniform(1.0, 60.0, N)
        pts = np.stack([rng.uniform(-0.9, 0.9, N) * tan * z,
                        rng.uniform(-0.9, 0.9, N) * tan * z, z],
                       1).astype(np.float32)
        pool = create_from_pcd(pts, rng.random((N, 3)).astype(np.float32),
                               204_800)
        view = np.eye(4, dtype=np.float32)
    else:
        from s3gaussian_tpu.train.checkpoints import load_ply_pool
        pool = load_ply_pool(args.ply)
        # mini-clip style camera: x forward, z up, cam at z=2 looking +x
        c2w = np.array([[0, 0, 1, 0], [-1, 0, 0, 0], [0, -1, 0, 2],
                        [0, 0, 0, 1]], np.float32)
        view = np.linalg.inv(c2w).T.astype(np.float32)

    # conventions (data/cameras.py, ops/transforms.py): `view` is the
    # row-vector W2C^T; full_proj = view @ proj^T; tanfov = tan(fov/2)
    tanfov = float(np.tan(0.5))
    proj = projection_matrix(0.01, 100.0, 1.0, 1.0)
    full = (view @ np.asarray(proj).T.astype(np.float32)).astype(np.float32)

    cov = build_cov3d(pool.get_scaling(), pool.get_rotation())
    pg = project_gaussians(jnp.asarray(pool.xyz), cov, jnp.asarray(view),
                           jnp.asarray(full), tanfov, tanfov, args.w, args.h,
                           alive=pool.alive)
    rect = np.asarray(pg.tiles_rect)
    vis = np.asarray(pg.visible)
    w = (rect[:, 2] - rect[:, 0])[vis]
    h = (rect[:, 3] - rect[:, 1])[vis]
    tiles = w * h
    radius = np.asarray(pg.radius)[vis]
    opac = np.asarray(pool.get_opacity()[:, 0])[np.asarray(pool.alive)]

    def q(x):
        return {f"p{p}": round(float(np.percentile(x, p)), 2)
                for p in (10, 50, 90, 99)}

    print(f"alive={int(pool.n_alive)} visible={vis.sum()}")
    print(f"tiles/gaussian: mean={tiles.mean():.2f} {q(tiles)}")
    print(f"  clamped@16: {(tiles > 16).mean() * 100:.1f}%"
          f"  pairs(sum, uncapped)={int(tiles.sum())}")
    print(f"radius px: mean={radius.mean():.1f} {q(radius)}")
    print(f"opacity: mean={opac.mean():.3f} {q(opac)}")


if __name__ == "__main__":
    main()
