"""Data-parallel training over the 8-device virtual CPU mesh: the sharded
step must (a) run, (b) keep replicated state consistent, and (c) match the
average-gradient semantics of per-camera steps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s3gaussian_tpu.config import (ModelHiddenParams, OptimizationParams,
                                   PipelineParams, RasterConfig)
from s3gaussian_tpu.data.cameras import stack_cameras
from s3gaussian_tpu.parallel.data_parallel import (
    make_mesh, make_parallel_train_step, make_parallel_train_steps_scan,
    replicate_state, shard_camera_batch, shard_camera_blocks)

import test_train_e2e as helpers


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_parallel_step_runs_and_descends():
    n_dev = min(len(jax.devices()), 4)
    mesh = make_mesh(n_dev)
    state, camera, hp, pipe, bg = helpers.setup(seed=0)
    opt = OptimizationParams()
    # batch = the same camera replicated (deterministic check) — then
    # distinct cameras via time perturbation would also work
    batch = stack_cameras([camera] * n_dev)

    step = make_parallel_train_step(mesh, "coarse", hp, opt, pipe,
                                    helpers.CFG, 1.0)
    state = replicate_state(state, mesh)
    batch = shard_camera_batch(batch, mesh)

    losses = []
    for _ in range(12):
        state, aux = step(state, batch, jnp.asarray(0, jnp.int32), bg)
        losses.append(float(aux["metrics"]["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # budget counters surface in the parallel path too (VERDICT r1 weak #5)
    for key in ("n_pairs", "overflow_rect", "overflow_visible",
                "overflow_pairs"):
        assert int(aux[key]) >= 0


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_parallel_matches_single_when_identical_cameras():
    """With the same camera on every device, the psum-averaged gradient
    equals the single-camera gradient, so one parallel step == one serial
    step (up to float addition order)."""
    from s3gaussian_tpu.train.trainer import train_step

    n_dev = 2
    mesh = make_mesh(n_dev)
    state, camera, hp, pipe, bg = helpers.setup(seed=1)
    opt = OptimizationParams()

    from s3gaussian_tpu.train.trainer import clone_state
    # train_step donates its input; keep a copy for the parallel branch
    s_serial, _ = train_step(clone_state(state), camera, "coarse", 0, hp,
                             opt, pipe, helpers.CFG, 1.0, bg)

    step = make_parallel_train_step(mesh, "coarse", hp, opt, pipe,
                                    helpers.CFG, 1.0)
    sp = replicate_state(state, mesh)
    batch = shard_camera_batch(stack_cameras([camera] * n_dev), mesh)
    s_par, _ = step(sp, batch, jnp.asarray(0, jnp.int32), bg)

    np.testing.assert_allclose(np.asarray(s_par.pool.xyz),
                               np.asarray(s_serial.pool.xyz),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(s_par.stats.xyz_grad_accum),
        np.asarray(s_serial.stats.xyz_grad_accum) * n_dev,
        rtol=1e-4, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_parallel_scan_fine_stage_descends():
    """Multi-step FINE-stage descent through the scanned DP dispatcher
    (deformation + hexplane gradients under shard_map + lax.scan):
    VERDICT r2 weak #5c."""
    n_dev = 2
    spd = 3
    mesh = make_mesh(n_dev)
    state, camera, hp, pipe, bg = helpers.setup(seed=2)
    opt = OptimizationParams()

    scan = make_parallel_train_steps_scan(mesh, "fine", hp, opt, pipe,
                                          helpers.CFG, 1.0)
    state = replicate_state(state, mesh)
    blocks = stack_cameras([stack_cameras([camera] * n_dev)] * spd)
    blocks = shard_camera_blocks(blocks, mesh)

    losses = []
    for _ in range(4):
        state, aux = scan(state, blocks, jnp.asarray(0, jnp.int32), bg)
        per_step = np.asarray(aux["metrics"]["loss"])
        assert per_step.shape == (spd,)
        losses.extend(per_step.tolist())
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_parallel_scan_matches_sequential_parallel_steps():
    """One scanned block of k DP steps == k sequential DP step dispatches
    (bitwise-equivalent math, same collectives)."""
    n_dev = 2
    spd = 2
    mesh = make_mesh(n_dev)
    state, camera, hp, pipe, bg = helpers.setup(seed=3)
    opt = OptimizationParams()
    import dataclasses
    cams = [camera,
            dataclasses.replace(camera, time=jnp.asarray(0.5, jnp.float32))]

    step = make_parallel_train_step(mesh, "fine", hp, opt, pipe,
                                    helpers.CFG, 1.0)
    s_seq = replicate_state(state, mesh)
    for cam in cams:
        batch = shard_camera_batch(stack_cameras([cam] * n_dev), mesh)
        s_seq, _ = step(s_seq, batch, jnp.asarray(0, jnp.int32), bg)

    scan = make_parallel_train_steps_scan(mesh, "fine", hp, opt, pipe,
                                          helpers.CFG, 1.0)
    blocks = stack_cameras([stack_cameras([c] * n_dev) for c in cams])
    s_scan, aux = scan(replicate_state(state, mesh),
                       shard_camera_blocks(blocks, mesh),
                       jnp.asarray(0, jnp.int32), bg)
    assert np.asarray(aux["metrics"]["loss"]).shape == (spd,)

    np.testing.assert_allclose(np.asarray(s_scan.pool.xyz),
                               np.asarray(s_seq.pool.xyz),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(s_scan.deform["mlp"]["pos"]["l2"]["w"]),
                               np.asarray(s_seq.deform["mlp"]["pos"]["l2"]["w"]),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multi-device mesh")
def test_parallel_densify_reset_cadence_matches_serial():
    """The full density-control cadence under DP: k DP steps (identical
    cameras => grads equal the serial single-camera grads) interleaved
    with densify_step + opacity_reset_step must leave the pool in the
    SAME state as the serial path (VERDICT r2 weak #5b)."""
    from s3gaussian_tpu.train.trainer import (densify_step,
                                              opacity_reset_step, train_step)

    n_dev = 4
    mesh = make_mesh(n_dev)
    state, camera, hp, pipe, bg = helpers.setup(seed=4)
    opt = OptimizationParams()

    step = make_parallel_train_step(mesh, "fine", hp, opt, pipe,
                                    helpers.CFG, 1.0)
    batch = shard_camera_batch(stack_cameras([camera] * n_dev), mesh)

    def cadence(s, parallel):
        rng = jax.random.PRNGKey(7)
        for i in range(1, 7):
            if parallel:
                s, _ = step(s, batch, jnp.asarray(0, jnp.int32), bg)
            else:
                s, _ = train_step(s, camera, "fine", 0, hp, opt, pipe,
                                  helpers.CFG, 1.0, bg)
            if i % 2 == 0:   # densify every 2 steps
                rng, sub = jax.random.split(rng)
                s, info = densify_step(s, sub, 1e-8, 0.005, 4.0, None, opt)
            if i == 4:       # one opacity reset mid-run
                s = opacity_reset_step(s)
        return s

    from s3gaussian_tpu.train.trainer import clone_state
    n_alive0 = int(state.pool.n_alive)
    # the steps donate their input states; branch from clones
    s_par = cadence(replicate_state(clone_state(state), mesh), True)
    s_ser = cadence(state, False)

    assert int(s_par.pool.n_alive) == int(s_ser.pool.n_alive)
    assert int(s_par.pool.n_alive) > n_alive0  # grew
    np.testing.assert_array_equal(np.asarray(s_par.pool.alive),
                                  np.asarray(s_ser.pool.alive))
    np.testing.assert_allclose(np.asarray(s_par.pool.xyz),
                               np.asarray(s_ser.pool.xyz),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_par.pool.opacity),
                               np.asarray(s_ser.pool.opacity),
                               rtol=2e-4, atol=1e-6)
    # Adam rows followed the densify surgery identically
    np.testing.assert_allclose(np.asarray(s_par.adam.mu["pool"]["xyz"]),
                               np.asarray(s_ser.adam.mu["pool"]["xyz"]),
                               rtol=2e-4, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_parallel_percam_stats_match_serial_multicam_distinct_cams():
    """With DISTINCT cameras across devices, the DP step's densify stats
    must use per-view semantics (norm-before-sum + visible-view-count
    denom), not the r3 batch-summed semantics root-caused as the multicam
    divergence (config.py multicam_percam_stats).  A DP batch [c1, c2] and
    a serial multicam rig [c1, c2] evaluate the same B-mean loss at the
    same params, so the full post-step state — pool params AND stats —
    must match exactly."""
    from s3gaussian_tpu.train.trainer import clone_state, train_step_multicam
    from test_multicam import shifted_camera

    n_dev = 2
    mesh = make_mesh(n_dev)
    state, camera, hp, pipe, bg = helpers.setup(seed=9)
    opt = OptimizationParams()
    assert opt.multicam_percam_stats == 1   # per-view is the default
    cams = [camera, shifted_camera(camera, 0.3)]

    s_mc, _ = train_step_multicam(clone_state(state), stack_cameras(cams),
                                  2, "fine", 0, hp, opt, pipe, helpers.CFG,
                                  1.0, bg)

    step = make_parallel_train_step(mesh, "fine", hp, opt, pipe,
                                    helpers.CFG, 1.0)
    sp = replicate_state(state, mesh)
    batch = shard_camera_batch(stack_cameras(cams), mesh)
    s_dp, _ = step(sp, batch, jnp.asarray(0, jnp.int32), bg)

    np.testing.assert_allclose(np.asarray(s_dp.stats.xyz_grad_accum),
                               np.asarray(s_mc.stats.xyz_grad_accum),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_array_equal(np.asarray(s_dp.stats.denom),
                                  np.asarray(s_mc.stats.denom))
    np.testing.assert_allclose(np.asarray(s_dp.stats.max_radii2d),
                               np.asarray(s_mc.stats.max_radii2d),
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(s_dp.pool.xyz),
                               np.asarray(s_mc.pool.xyz),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_parallel_multicam_matches_serial_multicam():
    """Multicam x DP composition (SURVEY §5.8a): with the same rig group on
    every device, one DP-multicam step == one serial train_step_multicam
    (psum-averaged grads equal the local grads)."""
    from s3gaussian_tpu.parallel.data_parallel import (
        make_parallel_train_step_multicam)
    from s3gaussian_tpu.train.trainer import clone_state, train_step_multicam
    from test_multicam import shifted_camera

    n_dev = 2
    mesh = make_mesh(n_dev)
    state, camera, hp, pipe, bg = helpers.setup(seed=8)
    opt = OptimizationParams()
    group = stack_cameras([camera, shifted_camera(camera, 0.2)])

    s_serial, aux_s = train_step_multicam(clone_state(state), group, 2,
                                          "fine", 0, hp, opt, pipe,
                                          helpers.CFG, 1.0, bg)

    step = make_parallel_train_step_multicam(mesh, 2, "fine", hp, opt,
                                             pipe, helpers.CFG, 1.0)
    sp = replicate_state(state, mesh)
    groups = shard_camera_batch(stack_cameras([group] * n_dev), mesh)
    s_par, aux_p = step(sp, groups, jnp.asarray(0, jnp.int32), bg)

    np.testing.assert_allclose(np.asarray(s_par.pool.xyz),
                               np.asarray(s_serial.pool.xyz),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(s_par.deform["mlp"]["pos"]["l2"]["w"]),
        np.asarray(s_serial.deform["mlp"]["pos"]["l2"]["w"]),
        rtol=1e-5, atol=1e-7)
    assert np.allclose(float(aux_p["metrics"]["loss"]),
                       float(aux_s["metrics"]["loss"]), rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_parallel_multicam_scan_descends():
    """Scanned multicam-DP blocks descend with distinct rigs per device."""
    from s3gaussian_tpu.parallel.data_parallel import (
        make_parallel_train_steps_scan_multicam)
    from test_multicam import shifted_camera

    n_dev = 2
    spd = 2
    mesh = make_mesh(n_dev)
    state, camera, hp, pipe, bg = helpers.setup(seed=9)
    opt = OptimizationParams()
    g1 = stack_cameras([camera, shifted_camera(camera, 0.15)])
    g2 = stack_cameras([shifted_camera(camera, -0.15),
                        shifted_camera(camera, 0.3)])

    scan = make_parallel_train_steps_scan_multicam(mesh, 2, "fine", hp,
                                                   opt, pipe, helpers.CFG,
                                                   1.0)
    state = replicate_state(state, mesh)
    # [spd, n_dev, n_cams, ...]
    blocks = stack_cameras([stack_cameras([g1, g2])] * spd)
    blocks = shard_camera_blocks(blocks, mesh)

    losses = []
    for _ in range(4):
        state, aux = scan(state, blocks, jnp.asarray(0, jnp.int32), bg)
        per_step = np.asarray(aux["metrics"]["loss"])
        assert per_step.shape == (spd,)
        losses.extend(per_step.tolist())
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
