"""End-to-end training slice on a tiny synthetic scene.

Renders a ground-truth image from a target Gaussian set, then trains a
jittered copy with the full train_step (coarse + fine stages, densify,
opacity reset) and checks the loss decreases — the jnp analog of the
reference's implicit training-telemetry validation (SURVEY §4).
"""

import numpy as np
import jax
import jax.numpy as jnp

from s3gaussian_tpu.config import (ModelHiddenParams, OptimizationParams,
                                   PipelineParams, RasterConfig)
from s3gaussian_tpu.data.cameras import Camera
from s3gaussian_tpu.models.deformation import init_deformation
from s3gaussian_tpu.models.pool import GaussianPool, create_from_pcd
from s3gaussian_tpu.render.renderer import render
from s3gaussian_tpu.train.trainer import (TrainState, densify_schedule,
                                          densify_step, init_state,
                                          opacity_reset_step, train_step)

from scenes import random_scene

W = H = 48
CFG = RasterConfig(max_visible=128, rect_w=6, rect_h=6, chunk=16,
                   use_pallas=False)


def small_hp():
    hp = ModelHiddenParams()
    hp.kplanes_config = dict(hp.kplanes_config)
    hp.kplanes_config["resolution"] = [8, 8, 8, 4]
    hp.kplanes_config["output_coordinate_dim"] = 8
    hp.multires = [1, 2]
    hp.net_width = 16
    return hp


def make_camera(sc, image, depth=None, time=0.0):
    return Camera(
        world_view=jnp.asarray(sc["view"]), full_proj=jnp.asarray(sc["proj"]),
        campos=jnp.zeros(3), time=jnp.asarray(time, jnp.float32),
        image=image, depth_map=depth,
        image_height=H, image_width=W, fovx=sc["fov"], fovy=sc["fov"])


def setup(seed=0, n=40, cap=256):
    sc = random_scene(n=n, seed=seed, w=W, h=H, zrange=(2.0, 6.0),
                      scale_range=(0.1, 0.25), opacity_range=(0.5, 0.9))
    target = create_from_pcd(sc["means"], sc["colors"], cap)
    hp = small_hp()
    pipe = PipelineParams()
    deform = init_deformation(jax.random.PRNGKey(1), hp)
    aabb = jnp.asarray([[8.0, 8.0, 8.0], [-8.0, -8.0, -8.0]])
    bg = jnp.zeros(3)
    cam0 = make_camera(sc, None)
    pkg = render(cam0, target, deform, hp, pipe, bg, aabb, 0,
                 stage="coarse", cfg=CFG)
    gt = jnp.clip(pkg["render"], 0, 1).transpose(1, 2, 0)
    gt_depth = pkg["depth"]
    camera = make_camera(sc, gt, gt_depth)

    # jittered init: perturb positions and colors
    rng = np.random.default_rng(seed + 10)
    pts = sc["means"] + rng.normal(scale=0.05, size=sc["means"].shape).astype(np.float32)
    cols = np.clip(sc["colors"] + rng.normal(scale=0.2, size=(n, 3)), 0, 1).astype(np.float32)
    pool = create_from_pcd(pts, cols, cap)
    state = init_state(pool, deform, aabb)
    return state, camera, hp, pipe, bg


def run_steps(state, camera, hp, pipe, bg, stage, n_steps, opt):
    losses = []
    for i in range(n_steps):
        state, aux = train_step(state, camera, stage, 0, hp, opt, pipe,
                                CFG, 1.0, bg)
        losses.append(float(aux["metrics"]["loss"]))
    return state, losses


def test_coarse_training_decreases_loss():
    state, camera, hp, pipe, bg = setup()
    opt = OptimizationParams()
    state, losses = run_steps(state, camera, hp, pipe, bg, "coarse", 60, opt)
    assert int(state.nan_skips) == 0
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_fine_training_runs_and_decreases():
    state, camera, hp, pipe, bg = setup(seed=2)
    opt = OptimizationParams()
    state, losses = run_steps(state, camera, hp, pipe, bg, "fine", 60, opt)
    assert int(state.nan_skips) == 0
    assert losses[-1] < losses[0]


def test_densify_and_reset_cycle():
    state, camera, hp, pipe, bg = setup(seed=3)
    opt = OptimizationParams()
    state, _ = run_steps(state, camera, hp, pipe, bg, "coarse", 10, opt)
    n0 = int(state.pool.n_alive)
    gthr, othr = densify_schedule(10, "coarse", opt)
    state2, info = densify_step(state, jax.random.PRNGKey(0),
                                gthr, othr, 5.0, None, opt)
    assert int(info["n_alive"]) == int(state2.pool.n_alive)
    # training continues after densify without recompile errors
    state2, losses = run_steps(state2, camera, hp, pipe, bg, "coarse", 5, opt)
    state3 = opacity_reset_step(state2)
    assert float(jnp.max(state3.pool.get_opacity()[state3.pool.alive])) <= 0.011
    state3, losses = run_steps(state3, camera, hp, pipe, bg, "coarse", 5, opt)
    assert np.isfinite(losses).all()


def test_stats_accumulate_during_training():
    state, camera, hp, pipe, bg = setup(seed=4)
    opt = OptimizationParams()
    state, _ = run_steps(state, camera, hp, pipe, bg, "coarse", 3, opt)
    assert float(jnp.sum(state.stats.denom)) > 0
    assert float(jnp.sum(state.stats.xyz_grad_accum)) > 0
    assert float(jnp.max(state.stats.max_radii2d)) > 0


def test_scan_steps_match_sequential():
    """train_steps_scan (n steps per dispatch) must produce exactly the
    same state chain as n sequential train_step calls."""
    import dataclasses
    import jax.numpy as jnp
    from s3gaussian_tpu.config import OptimizationParams
    from s3gaussian_tpu.data.cameras import stack_cameras
    from s3gaussian_tpu.train.trainer import (clone_state, train_step,
                                              train_steps_scan)

    state, camera, hp, pipe, bg = setup(seed=2)
    opt = OptimizationParams()
    cams = [dataclasses.replace(camera,
                                time=jnp.asarray(0.1 * i, jnp.float32))
            for i in range(3)]

    # the step donates its input state; branching two trajectories from
    # one start needs an explicit clone (trainer.clone_state)
    s_seq = clone_state(state)
    for c in cams:
        s_seq, aux_seq = train_step(s_seq, c, "fine", 0, hp, opt, pipe,
                                    CFG, 1.0, bg)

    s_scan, aux_scan = train_steps_scan(state, stack_cameras(cams), "fine",
                                        0, hp, opt, pipe, CFG, 1.0, bg)
    np.testing.assert_allclose(np.asarray(s_scan.pool.xyz),
                               np.asarray(s_seq.pool.xyz), atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_scan.stats.xyz_grad_accum),
                               np.asarray(s_seq.stats.xyz_grad_accum),
                               atol=1e-7)
    assert int(s_scan.step) == int(s_seq.step) == 3
    assert aux_scan["metrics"]["loss"].shape == (3,)
    np.testing.assert_allclose(float(aux_scan["metrics"]["loss"][-1]),
                               float(aux_seq["metrics"]["loss"]), rtol=1e-6)


def test_densify_schedule_densify_off():
    """densify_until_iter=0 (densification fully off, the AN/ANP probe
    legs + prune_after_densify continuation) must not divide by zero and
    must return the end-of-anneal thresholds."""
    from s3gaussian_tpu.config import OptimizationParams

    opt = OptimizationParams()
    opt.densify_until_iter = 0
    g, o = densify_schedule(500, "fine", opt)
    assert g == opt.densify_grad_threshold_after
    assert o == opt.opacity_threshold_fine_after
    # past densify_until the anneal clamps at its final value
    opt.densify_until_iter = 100
    g2, o2 = densify_schedule(1000, "fine", opt)
    assert g2 == opt.densify_grad_threshold_after
    assert o2 == opt.opacity_threshold_fine_after
