#!/usr/bin/env python
"""Component-level rasterizer profiling on the current backend.

Uses chained host-fetch syncs (block_until_ready is unreliable over remote
device transports) and reports per-component times for a Waymo-scale
synthetic scene.

    python scripts/profile_raster.py [--n 500000] [--steps 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=500_000)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--height", type=int, default=640)
    parser.add_argument("--width", type=int, default=960)
    parser.add_argument("--max_visible", type=int, default=1 << 18)
    parser.add_argument("--rect", type=int, default=5)
    parser.add_argument("--tile", type=int, default=16)
    parser.add_argument("--pair_budget", type=int, default=1 << 22)
    parser.add_argument("--chunk", type=int, default=128)
    args = parser.parse_args(argv)

    import jax
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.jax_cache_bench"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from s3gaussian_tpu.ops import composite as comp
    from s3gaussian_tpu.ops import tile_kernels as tk
    from s3gaussian_tpu.ops.binning import bin_gaussians
    from s3gaussian_tpu.ops.project import build_cov3d, project_gaussians
    from s3gaussian_tpu.ops.transforms import projection_matrix

    H, W, N = args.height, args.width, args.n
    TX = TY = args.tile
    GX, GY = -(-W // TX), -(-H // TY)
    NR, RW, RH = args.max_visible, args.rect, args.rect

    rng = np.random.default_rng(0)
    tan = np.tan(0.5)
    z = rng.uniform(1.0, 60.0, N)
    means = jnp.asarray(np.stack([rng.uniform(-0.9, 0.9, N) * tan * z,
                                  rng.uniform(-0.9, 0.9, N) * tan * z, z],
                                 1), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.01, 0.15, (N, 3)), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(N, 4)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.1, 0.9, N), jnp.float32)
    cols = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
    view = jnp.asarray(np.eye(4, dtype=np.float32))
    pm = projection_matrix(0.01, 100.0, 1.0, 1.0)
    projm = jnp.asarray((np.eye(4).T @ pm.T).astype(np.float32))

    def timed(name, fn, *xs, steps=args.steps):
        f = jax.jit(fn)
        r = f(*xs)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32).ravel()[:4]))
        t0 = time.perf_counter()
        outs = [f(*xs) for _ in range(steps)]
        for o in outs:
            float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32).ravel()[:4]))
        dt = (time.perf_counter() - t0) / steps * 1e3
        print(f"{name:>24}: {dt:8.2f} ms")
        return f(*xs)

    proj = timed("project", lambda m: project_gaussians(
        m, build_cov3d(scales, quats), view, projm, tan, tan, W, H, TX, TY),
        means)
    b = timed("binning", lambda p: bin_gaussians(p, GX, GY, NR, RW, RH, TX, TY,
                                                 args.pair_budget), proj)
    print(f"{'n_pairs':>24}: {int(b.n_pairs)}")
    feat = timed("pack+gather", lambda p, bb: comp.pack_pool_features(
        p.xy, p.conic, opac, cols, p.depth)[:, bb.sel[bb.sorted_gid]],
        proj, b)
    out = timed("fwd kernel", lambda pf, ts: tk.composite_fwd_pallas(
        pf, ts, GX, GY, TX, TY, args.chunk), feat, b.tile_starts)
    dout = jnp.zeros_like(out).at[:, 0:4].set(1.0)
    pg = timed("bwd kernel", lambda pf, ts, o, do: tk.composite_bwd_pallas(
        pf, ts, o, do, GX, GY, TX, TY, args.chunk), feat, b.tile_starts, out, dout)
    bp = feat.shape[1]

    def reduce_gid(g, bb):
        g = jnp.where((jnp.arange(bp) < bb.n_pairs)[None, :], g, 0.0)
        gid2, pos = jax.lax.sort(
            (bb.sorted_gid, jnp.arange(bp, dtype=jnp.int32)), num_keys=1)
        pg_s = g[:, pos]
        cum = jnp.concatenate(
            [jnp.zeros((comp.PAIR_FEAT_DIM, 1)), jnp.cumsum(pg_s, axis=1)], 1)
        starts = jnp.searchsorted(gid2, jnp.arange(NR + 1, dtype=jnp.int32))
        return cum[:, starts[1:]] - cum[:, starts[:-1]]

    timed("bwd segreduce", reduce_gid, pg, b)


if __name__ == "__main__":
    main()
