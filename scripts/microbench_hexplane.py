#!/usr/bin/env python
"""Microbenchmark: hexplane query fwd/bwd per scale, isolating the spatial
plane scatter-add backward that dominates the deformation step cost.

    python scripts/microbench_hexplane.py [--n 204800]
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
    p.add_argument("--n", type=int, default=204800)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args(argv)

    import jax
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.jax_cache_bench"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from s3gaussian_tpu.models import hexplane as hx

    N = args.n
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    params = init = hx.init_hexplane(key)
    pts = jnp.asarray(rng.uniform(-0.9, 0.9, (N, 3)), jnp.float32)
    t = jnp.float32(0.37)
    aabb = jnp.asarray([[1.0, 1.0, 1.0], [-1.0, -1.0, -1.0]], jnp.float32)

    def timed(name, fn, *xs, steps=args.steps):
        f = jax.jit(fn)
        r = f(*xs)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(steps):
            r = f(*xs)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / steps * 1e3
        print(f"{name:>44}: {dt:8.2f} ms")

    def query(p, use_bf16=True):
        return hx.query_hexplane(p, pts, t, aabb, 4,
                                 compute_dtype=jnp.bfloat16 if use_bf16
                                 else None)

    timed("query fwd (4 scales, bf16)", lambda p: query(p), params)
    timed("query fwd+bwd (4 scales, bf16)",
          lambda p: jax.grad(lambda q: jnp.sum(query(q)))(p), params)
    timed("query fwd+bwd (4 scales, f32)",
          lambda p: jax.grad(lambda q: jnp.sum(query(q, False)))(p), params)

    # per-scale: single-scale param subsets
    for s in range(4):
        sub = {k.replace(f"scale{s}_", "scale0_"): v
               for k, v in params.items() if k.startswith(f"scale{s}_")}
        timed(f"scale{s} fwd+bwd (bf16)",
              lambda p: jax.grad(lambda q: jnp.sum(
                  hx.query_hexplane(q, pts, t, aabb, 1,
                                    compute_dtype=jnp.bfloat16)))(p), sub)

    # isolate one spatial-plane sample bwd per scale (plane0 = xy)
    from s3gaussian_tpu.ops.gridsample import grid_sample_2d
    for s in range(4):
        plane = params[f"scale{s}_plane0"]
        coords = pts[:, :2]

        def one(pl):
            v = grid_sample_2d(pl.astype(jnp.bfloat16), coords)
            return jnp.sum(v.astype(jnp.float32))

        timed(f"scale{s} ONE spatial plane fwd+bwd (bf16)",
              lambda pl: jax.grad(one)(pl), plane)


if __name__ == "__main__":
    main()
