#!/usr/bin/env python
"""Component-level profile of the ACTUAL train-step path (bench.py
workload): payload-carrying sort, Pallas kernels, backward unsort+reduce,
deformation fwd/bwd, losses, Adam.

Chained host-fetch syncs (block_until_ready is unreliable over remote
device transports); times include ~25-30 ms/call dispatch overhead of the
tunnel, so compare deltas, not absolutes.

    python scripts/profile_train.py [--n 200000] [--steps 10]
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
    parser.add_argument("--n", type=int, default=200_000)
    parser.add_argument("--cap", type=int, default=204_800)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--height", type=int, default=640)
    parser.add_argument("--width", type=int, default=960)
    parser.add_argument("--rect", type=int, default=4)
    parser.add_argument("--tile", type=int, default=16)
    parser.add_argument("--chunk", type=int, default=128)
    args = parser.parse_args(argv)

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
    from s3gaussian_tpu.ops import composite as comp
    from s3gaussian_tpu.ops import tile_kernels as tk
    from s3gaussian_tpu.ops.binning import make_pair_keys, tile_ranges
    from s3gaussian_tpu.ops.project import (build_cov3d, project_gaussians,
                                            sh_to_color)
    from s3gaussian_tpu.ops.transforms import projection_matrix
    from s3gaussian_tpu.train.losses import l1_loss, ssim
    from s3gaussian_tpu.train.optim import init_adam, adam_update, path_group
    from s3gaussian_tpu.train.trainer import init_state, train_step

    H, W, N, CAP = args.height, args.width, args.n, args.cap
    TX = TY = args.tile
    GX, GY = -(-W // TX), -(-H // TY)
    RW = RH = args.rect
    RC = RW * RH

    rng = np.random.default_rng(0)
    tan = np.tan(0.5)
    z = rng.uniform(1.0, 60.0, N)
    pts = np.stack([rng.uniform(-0.9, 0.9, N) * tan * z,
                    rng.uniform(-0.9, 0.9, N) * tan * z, z], 1).astype(np.float32)
    cols = rng.random((N, 3)).astype(np.float32)
    pool = create_from_pcd(pts, cols, CAP)
    hp = ModelHiddenParams()
    deform = init_deformation(jax.random.PRNGKey(0), hp)
    aabb = jnp.asarray([[80.0, 80.0, 80.0], [-80.0, -80.0, -10.0]])

    view = jnp.asarray(np.eye(4, dtype=np.float32))
    pm = projection_matrix(0.01, 100.0, 1.0, 1.0)
    projm = jnp.asarray((np.eye(4).T @ pm.T).astype(np.float32))
    campos = jnp.zeros(3)

    def timed(name, fn, *xs, steps=args.steps):
        f = jax.jit(fn)
        r = f(*xs)
        float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32).ravel()[:4]))
        t0 = time.perf_counter()
        outs = [f(*xs) for _ in range(steps)]
        for o in outs:
            float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32).ravel()[:4]))
        dt = (time.perf_counter() - t0) / steps * 1e3
        print(f"{name:>28}: {dt:8.2f} ms", flush=True)
        return f(*xs)

    # --- projection + keys over the pool (activations like the renderer) ---
    def proj_fn(p):
        scales = jnp.exp(p.scaling)
        rots = p.rotation / jnp.linalg.norm(p.rotation, axis=-1, keepdims=True)
        cov3d = build_cov3d(scales, rots)
        pr = project_gaussians(p.xyz, cov3d, view, projm, tan, tan, W, H,
                               TX, TY, alive=p.alive)
        return pr

    proj = timed("project(pool)", proj_fn, pool)
    pk = timed("make_pair_keys",
               lambda pr: make_pair_keys(pr, GX, GY, CAP, RW, RH, TX, TY),
               proj)
    nr = pk.sel.shape[0]
    m = nr * RC
    bp = m
    print(f"{'M pairs (slots)':>28}: {m}")

    shs = jnp.concatenate([pool.features_dc, pool.features_rest], 1)
    colors = sh_to_color(shs, pool.xyz, campos, 3)
    opac = jax.nn.sigmoid(pool.opacity[:, 0])
    feat_pool = comp.pack_pool_features(proj.xy, proj.conic, opac, colors,
                                        proj.depth)

    # --- the forward payload sort exactly as rasterizer._sort_stream ---
    n_data = comp.FD + 1

    def sort_stream(fp, keys, sel):
        slot = jnp.arange(m, dtype=jnp.int32)
        exp = jnp.repeat(fp[:n_data][:, sel], RC, axis=1)
        rows = tuple(exp[i] for i in range(n_data))
        out = jax.lax.sort((keys, slot) + rows, num_keys=1)
        sorted_tile = out[0] >> jnp.uint32(20)
        stream = jnp.concatenate(
            [jnp.stack([r[:bp] for r in out[2:]], 0),
             jnp.ones((1, bp), jnp.float32),
             jnp.zeros((comp.PAIR_FEAT_DIM - n_data - 1, bp), jnp.float32)], 0)
        ts, n_pairs, _ = tile_ranges(sorted_tile, GX * GY, bp)
        return stream, out[1], ts, n_pairs

    stream, sorted_slot, ts, n_pairs = timed(
        "fwd sort (key+slot+10 rows)", sort_stream, feat_pool, pk.keys, pk.sel)
    print(f"{'n_pairs':>28}: {int(n_pairs)}")

    timed("fwd sort keys+slot only",
          lambda k: jax.lax.sort((k, jnp.arange(m, dtype=jnp.int32)),
                                 num_keys=1), pk.keys)

    # the repeat+gather that feeds the sort, alone
    timed("pair expand (repeat+sel)",
          lambda fp, sel: jnp.repeat(fp[:n_data][:, sel], RC, axis=1),
          feat_pool, pk.sel)

    out = timed("fwd pallas kernel",
                lambda s, t: tk.composite_fwd_pallas(s, t, GX, GY, TX, TY,
                                                     args.chunk), stream, ts)
    dout = jnp.zeros_like(out).at[:, 0:4].set(1.0)
    pg = timed("bwd pallas kernel",
               lambda s, t, o, do: tk.composite_bwd_pallas(
                   s, t, o, do, GX, GY, TX, TY, args.chunk),
               stream, ts, out, dout)

    def bwd_unsort(g, sl, np_):
        g = jnp.where((jnp.arange(bp) < np_)[None, :], g[:, :bp], 0.0)
        rows = tuple(g[i] for i in range(n_data))
        s = jax.lax.sort((sl,) + rows, num_keys=1)
        d_slot = jnp.stack(s[1:], 0)
        return d_slot.reshape(n_data, nr, RC).sum(-1)

    timed("bwd unsort (slot+10 rows)", bwd_unsort, pg, sorted_slot, n_pairs)

    # --- deformation ---
    t_scalar = jnp.asarray(0.4, jnp.float32)

    def deform_fwd(p, dp):
        shs_ = jnp.concatenate([p.features_dc, p.features_rest], 1)
        t_col = jnp.full((p.xyz.shape[0], 1), t_scalar)
        out = apply_deformation(dp, hp, aabb, p.xyz, p.scaling, p.rotation,
                                p.opacity, shs_, t_col)
        return out.xyz

    timed("deform fwd (pool)", deform_fwd, pool, deform)

    def deform_vjp(p, dp):
        return jax.value_and_grad(
            lambda d: jnp.sum(deform_fwd(p, d)))(dp)

    timed("deform fwd+bwd (pool)", deform_vjp, pool, deform)

    # --- losses ---
    img = jnp.asarray(rng.random((3, H, W)), jnp.float32)
    gt = jnp.asarray(rng.random((3, H, W)), jnp.float32)

    def loss_fn(x):
        return l1_loss(x, gt) + 0.2 * (1 - ssim(x, gt))

    timed("l1+ssim fwd+bwd", lambda x: jax.value_and_grad(loss_fn)(x), img)

    # --- adam over the full tree ---
    params = {"pool": pool.param_dict(), "deform": deform}
    adam = init_adam(params)
    grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 1e-6, params)

    timed("adam update (full tree)",
          lambda p, g, a: adam_update(p, g, a,
                                      lr_for_leaf=lambda path: 1e-4),
          params, grads, adam)

    # --- whole step for reference ---
    opt = OptimizationParams()
    pipe = PipelineParams()
    cfg = RasterConfig(tile_x=TX, tile_y=TY, max_visible=CAP,
                       rect_w=RW, rect_h=RH, pair_budget=1 << 22)
    state = init_state(pool, deform, aabb)
    gtimg = rng.random((H, W, 3)).astype(np.float32)
    gtd = rng.uniform(1, 70, (H, W)).astype(np.float32)
    full = (np.eye(4).T @ np.asarray(pm).T).astype(np.float32)
    cam = Camera(world_view=view, full_proj=jnp.asarray(full),
                 campos=campos, time=t_scalar,
                 image=jnp.asarray(gtimg), depth_map=jnp.asarray(gtd),
                 image_height=H, image_width=W, fovx=1.0, fovy=1.0)
    bg = jnp.zeros(3)

    def step_fn(st):
        st2, aux = train_step(st, cam, "fine", 3, hp, opt, pipe, cfg, 30.0, bg)
        return st2.pool.xyz

    timed("FULL train step", step_fn, state)


if __name__ == "__main__":
    main()
