#!/usr/bin/env python
"""Microbenchmarks for the pair-stream data-movement design space on TPU.

Question under test: for turning per-pair gradients back into per-Gaussian
sums (and for building the sorted pair feature stream in the forward), is it
cheaper to (a) kv-sort indices then gather columns, (b) carry the feature
rows as sort payloads, or (c) gather via a precomputed inverse permutation
+ reshape-sum?  Gathers cost ~15-40 ns per *index* on this TPU regardless
of row width, so the candidates trade index counts against sort passes.

    python scripts/microbench_sort.py [--m 4194304] [--nr 262144]
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
    p.add_argument("--m", type=int, default=1 << 22)
    p.add_argument("--nr", type=int, default=1 << 18)
    p.add_argument("--rows", type=int, default=16)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args(argv)

    import jax
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.jax_cache_bench"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    M, NR, R = args.m, args.nr, args.rows
    rect = M // NR
    rng = np.random.default_rng(0)
    perm = rng.permutation(M).astype(np.int32)
    sorted_slot = jnp.asarray(perm)                      # slot of sorted pair i
    sorted_gid = sorted_slot // rect
    rows = jnp.asarray(rng.normal(size=(R, M)), jnp.float32)

    def timed(name, fn, *xs, steps=args.steps):
        f = jax.jit(fn)
        r = f(*xs)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32).ravel()[:4]))
        t0 = time.perf_counter()
        outs = [f(*xs) for _ in range(steps)]
        for o in outs:
            float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32).ravel()[:4]))
        dt = (time.perf_counter() - t0) / steps * 1e3
        print(f"{name:>38}: {dt:8.2f} ms")

    iota = jnp.arange(M, dtype=jnp.int32)

    # primitive costs
    timed("sort key+idx (u32,i32)", lambda k: jax.lax.sort(
        (k.astype(jnp.uint32), iota), num_keys=1), sorted_slot)
    timed(f"sort key+{R}xf32 payload", lambda k, r: jax.lax.sort(
        (k.astype(jnp.uint32),) + tuple(r[i] for i in range(R)), num_keys=1),
        sorted_slot, rows)
    timed("gather [R,M] by M idx", lambda r, i: r[:, i], rows, sorted_slot)
    timed("cumsum [R,M]", lambda r: jnp.cumsum(r, axis=1), rows)
    timed("reshape-sum [R,NR,rect]", lambda r: r.reshape(R, NR, rect).sum(-1),
          rows)

    def tri_cumsum(r):
        # within-block inclusive prefix via [128,128] tri matmul + block offsets
        blk = 128
        nb = M // blk
        x = r.reshape(R, nb, blk)
        row = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (blk, blk), 1)
        tri = (row <= col).astype(jnp.float32)
        within = jax.lax.dot_general(x, tri, (((2,), (0,)), ((), ())),
                                     precision=jax.lax.Precision.HIGHEST)
        bsum = within[:, :, blk - 1]
        boff = jnp.cumsum(bsum, axis=1) - bsum
        return (within + boff[:, :, None]).reshape(R, M)

    timed("tri-matmul cumsum [R,M]", tri_cumsum, rows)

    # full candidate pipelines for the backward reduction
    def cand_a(gid, r):
        g2, pos = jax.lax.sort((gid, iota), num_keys=1)
        pg = r[:, pos]
        cum = jnp.concatenate([jnp.zeros((R, 1)), jnp.cumsum(pg, axis=1)], 1)
        starts = jnp.searchsorted(g2, jnp.arange(NR + 1, dtype=jnp.int32))
        return cum[:, starts[1:]] - cum[:, starts[:-1]]

    def cand_b(slot, r):
        _, pos = jax.lax.sort((slot, iota), num_keys=1)  # inv perm (in binning)
        d_slot = r[:, pos]
        return d_slot.reshape(R, NR, rect).sum(-1)

    def cand_c(slot, r):
        out = jax.lax.sort((slot,) + tuple(r[i] for i in range(R)), num_keys=1)
        d_slot = jnp.stack(out[1:], 0)
        return d_slot.reshape(R, NR, rect).sum(-1)

    timed("A: gid-sort+gather+cumsum (current)", cand_a, sorted_gid, rows)
    timed("B: slot-sort+gather+reshape-sum", cand_b, sorted_slot, rows)
    timed("C: payload-sort+reshape-sum", cand_c, sorted_slot, rows)


if __name__ == "__main__":
    main()
