#!/usr/bin/env python
"""Tiny-scale CPU repro harness for the multicam divergence.

The TPU A/B protocol (BASELINE.md "multicam training divergence") showed
batched same-frame multicam training collapsing where single-camera
training holds, with exact gradient parity between the two programs
(tests/test_multicam.py::test_multicam_b3_yawed_rig_matches_sequential_oracle)
— so the cause is optimization *dynamics*, not program math.  This script
searches for a fast local repro: same scene, same yawed 3-camera rig,
long horizons, on the 48x48 test scene.

    python scripts/repro_multicam_cpu.py --steps 2000 --legs m3,s1,c3
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def build(seed=11, n=60):
    import test_train_e2e as helpers
    from test_multicam import yawed_camera
    from scenes import random_scene
    from s3gaussian_tpu.models.pool import create_from_pcd

    state, camera, hp, pipe, bg = helpers.setup(seed=seed, n=n)
    sc = random_scene(n=n, seed=seed, w=helpers.W, h=helpers.H,
                      zrange=(2.0, 6.0), scale_range=(0.1, 0.25),
                      opacity_range=(0.5, 0.9))
    target = create_from_pcd(sc["means"], sc["colors"], 256)
    cams = [yawed_camera(camera, target, state.deform, hp, pipe, bg,
                         state.aabb, yaw, tx)
            for yaw, tx in ((0.0, 0.0), (0.35, 0.2), (-0.35, -0.2))]
    return state, cams, hp, pipe, bg


def run_leg(leg, steps, seed=11, log_every=100):
    from s3gaussian_tpu.config import OptimizationParams
    from s3gaussian_tpu.data.cameras import stack_cameras
    from s3gaussian_tpu.train.trainer import (train_step,
                                              train_step_multicam)
    import test_train_e2e as helpers

    state, cams, hp, pipe, bg = build(seed=seed)
    opt = OptimizationParams()
    rng = np.random.default_rng(seed)
    hist = []
    CFG = helpers.CFG
    for i in range(steps):
        if leg == "m3":           # batched rig, one step per "frame"
            batch = stack_cameras(cams)
            state, aux = train_step_multicam(state, batch, 3, "fine", 0,
                                             hp, opt, pipe, CFG, 1.0, bg)
        elif leg == "c3":         # clone-cam control: B copies of one cam
            c = cams[int(rng.integers(3))]
            batch = stack_cameras([c, c, c])
            state, aux = train_step_multicam(state, batch, 3, "fine", 0,
                                             hp, opt, pipe, CFG, 1.0, bg)
        elif leg == "s1":         # sequential single-camera, random order
            c = cams[int(rng.integers(3))]
            state, aux = train_step(state, c, "fine", 0, hp, opt, pipe,
                                    CFG, 1.0, bg)
        else:
            raise SystemExit(f"unknown leg {leg}")
        if i % log_every == 0 or i == steps - 1:
            m = aux["metrics"]
            op = jax.nn.sigmoid(state.pool.opacity[:, 0])
            alive = state.pool.alive
            washed = float(jnp.sum((op < 0.05) & alive) /
                           jnp.maximum(jnp.sum(alive), 1))
            mx = float(jnp.max(jnp.where(
                alive[:, None], jnp.exp(state.pool.scaling), 0.0)))
            hist.append((i, float(m["psnr"]), washed, mx))
            print(f"{leg} step {i:5d} psnr {float(m['psnr']):6.2f} "
                  f"washed {washed:.3f} maxscale {mx:8.2f}", flush=True)
    return hist


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--legs", default="m3,s1")
    p.add_argument("--seed", type=int, default=11)
    args = p.parse_args(argv)
    out = {}
    for leg in args.legs.split(","):
        out[leg] = run_leg(leg.strip(), args.steps, seed=args.seed)
    print("SUMMARY")
    for leg, hist in out.items():
        i, psnr, washed, mx = hist[-1]
        print(f"  {leg}: final psnr {psnr:.2f} washed {washed:.3f} "
              f"maxscale {mx:.2f}")


if __name__ == "__main__":
    main()
