"""Multi-device training: camera-batch data parallelism over a device mesh.

The reference is strictly single-process/single-GPU (SURVEY §2.1/§5.8);
its ``batch_size > 1`` python loop (train.py:328-360) is the natural
parallel seam.  Here that seam becomes a ``shard_map`` over a
``jax.sharding.Mesh``:

  * the camera batch is sharded along the ``data`` axis (one camera per
    device per step — the reference's batch_size generalizes to
    n_devices);
  * Gaussian pool + deformation parameters are replicated;
  * per-device loss gradients are ``psum``'d over ICI before the Adam
    update, which every device applies identically (replicated state stays
    bitwise consistent);
  * densification statistics aggregate with psum (grad accumulation /
    denominators) and pmax (screen radii), matching the reference's
    cross-batch max/any reductions (train.py:391-393).

Inside the shard_map body each device runs the plain single-camera
pipeline, so the Pallas kernels never need to be vmapped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from s3gaussian_tpu.config import (ModelHiddenParams, OptimizationParams,
                                   PipelineParams, RasterConfig)
from s3gaussian_tpu.data.cameras import Camera
from s3gaussian_tpu.train.trainer import (TrainState, apply_param_update,
                                          compute_loss)


def make_mesh(n_data: int = 0) -> Mesh:
    devs = np.array(jax.devices()[:n_data] if n_data else jax.devices())
    return Mesh(devs, axis_names=("data",))


def _device_step(state: TrainState, cam: Camera, active_sh_degree,
                 bg: jnp.ndarray, *, stage, hp, opt, pipe, cfg,
                 spatial_lr_scale, use_custom_vjp, n_dev):
    """One per-device train step INSIDE shard_map (``cam`` has no batch
    axis): local grad, cross-device psum/pmean/pmax reductions, then the
    same post-gradient update as the single-device path
    (trainer.apply_param_update)."""
    params = {"pool": state.pool.param_dict(), "deform": state.deform}
    tap = jnp.zeros((state.pool.capacity, 2))
    (loss, aux), grads = jax.value_and_grad(
        compute_loss, argnums=(0, 1), has_aux=True)(
            params, tap, state.pool.alive, cam, stage, active_sh_degree,
            hp, opt, pipe, state.aabb, bg, cfg, use_custom_vjp)
    pgrads, tap_grad = grads

    # cross-device reductions (the batched-loss gradient is the mean)
    pgrads = jax.tree_util.tree_map(
        lambda g: jax.lax.psum(g, "data") / n_dev, pgrads)
    if bool(opt.multicam_percam_stats):
        # per-view densify stats (the flag governs EVERY batched-view
        # seam, DP camera batches included): norm each device's own
        # screen gradient BEFORE the cross-device sum, and count the
        # devices that actually saw each point as the denominator.
        # Summing the raw vectors instead (the else-branch / r3
        # semantics) lets opposing-view gradients cancel inside the norm
        # while the union-visibility denom deflates the average — the
        # mechanism measured as the r3 multicam divergence
        # (config.py multicam_percam_stats; BASELINE.md r4 bisect legs
        # BN vs BP), and it is identical here with cameras spread over
        # devices rather than over a rig.
        tap_grad = jax.lax.psum(
            jnp.linalg.norm(tap_grad[..., :2], axis=-1), "data")
        vis_count = jax.lax.psum(aux["visible"].astype(jnp.int32), "data")
    else:
        tap_grad = jax.lax.psum(tap_grad, "data")
        vis_count = None
    loss = jax.lax.pmean(loss, "data")
    radii = jax.lax.pmax(aux["radii"], "data")
    visible = jax.lax.pmax(aux["visible"].astype(jnp.int32), "data") > 0
    metrics = jax.tree_util.tree_map(lambda m: jax.lax.pmean(m, "data"),
                                     aux["metrics"])
    # budget counters: report the worst device so truncation is never
    # silently averaged away (VERDICT r1 weak #5)
    counters = {k: jax.lax.pmax(aux[k], "data")
                for k in ("n_pairs", "overflow_rect", "overflow_visible",
                          "overflow_pairs")}

    new_state = apply_param_update(state, params, pgrads, tap_grad,
                                   loss, radii, visible, opt,
                                   spatial_lr_scale, vis_count=vis_count)
    return new_state, {"metrics": metrics, **counters}


def make_parallel_train_step(mesh: Mesh, stage: str,
                             hp: ModelHiddenParams, opt: OptimizationParams,
                             pipe: PipelineParams, cfg: RasterConfig,
                             spatial_lr_scale: float,
                             use_custom_vjp: bool = True):
    """Returns a jitted (state, camera_batch, active_sh_degree, bg) ->
    (state, aux) step.

    ``camera_batch`` is a Camera pytree with a leading axis equal to the
    mesh's data-axis size (see data.cameras.stack_cameras).
    ``active_sh_degree`` is a TRACED scalar, like the single-device step
    (trainer.py) — the oneupSHdegree schedule costs zero recompiles of
    the multi-device program.  ``aux`` holds ``metrics`` (pmean'd) plus
    the budget counters ``n_pairs`` / ``overflow_rect`` /
    ``overflow_visible`` / ``overflow_pairs`` (pmax'd, i.e. the worst
    device).
    """
    import functools

    n_dev = mesh.shape["data"]
    body = functools.partial(
        _device_step, stage=stage, hp=hp, opt=opt, pipe=pipe, cfg=cfg,
        spatial_lr_scale=spatial_lr_scale, use_custom_vjp=use_custom_vjp,
        n_dev=n_dev)

    def per_device(state: TrainState, cam: Camera, active_sh_degree,
                   bg: jnp.ndarray):
        # cam arrives with a leading local-shard axis of size 1
        cam = jax.tree_util.tree_map(lambda x: x[0], cam)
        return body(state, cam, active_sh_degree, bg)

    from jax import shard_map

    state_spec = P()          # replicated
    cam_spec = P("data")      # leading batch axis sharded

    step = shard_map(
        per_device, mesh=mesh,
        in_specs=(state_spec, cam_spec, state_spec, state_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False)
    return jax.jit(step)


def _device_step_multicam(state: TrainState, cams: Camera, n_cams: int,
                          active_sh_degree, bg: jnp.ndarray, *, stage, hp,
                          opt, pipe, cfg, spatial_lr_scale, use_custom_vjp,
                          n_dev):
    """One per-device MULTICAM train step inside shard_map: the device's
    shard is a same-timestep camera group ([n_cams, ...] leaves, one frame's
    rig), rendered with ONE deformation evaluation (render_multicam); the
    pooled per-device loss gradients psum across the mesh.  This composes
    the two scaling seams — rig batching per device × frames across devices
    — the v5p-8 production configuration (SURVEY §5.8a)."""
    from s3gaussian_tpu.train.trainer import compute_loss_multicam

    params = {"pool": state.pool.param_dict(), "deform": state.deform}
    percam = bool(opt.multicam_percam_stats)
    if percam:
        tap = jnp.zeros((n_cams, state.pool.capacity, 2))
    else:
        tap = jnp.zeros((state.pool.capacity, 2))
    (loss, aux), grads = jax.value_and_grad(
        compute_loss_multicam, argnums=(0, 1), has_aux=True)(
            params, tap, state.pool.alive, cams, n_cams, stage,
            active_sh_degree, hp, opt, pipe, state.aabb, bg, cfg,
            use_custom_vjp)
    pgrads, tap_grad = grads

    pgrads = jax.tree_util.tree_map(
        lambda g: jax.lax.psum(g, "data") / n_dev, pgrads)
    if percam:
        # per-device: each camera's tap grad is g_b/B (device loss is a
        # B-mean, not divided by n_dev) — per-view norms sum across the
        # rig, then across devices, matching B*n_dev reference
        # batch_size=1 iterations (trainer.apply_param_update vis_count)
        tap_grad = jax.lax.psum(jnp.sum(jnp.linalg.norm(
            tap_grad[..., :2] * n_cams, axis=-1), axis=0), "data")
        vis_count = jax.lax.psum(aux["vis_count"], "data")
    else:
        tap_grad = jax.lax.psum(tap_grad, "data")
        vis_count = None
    loss = jax.lax.pmean(loss, "data")
    radii = jax.lax.pmax(aux["radii"], "data")
    visible = jax.lax.pmax(aux["visible"].astype(jnp.int32), "data") > 0
    metrics = jax.tree_util.tree_map(lambda m: jax.lax.pmean(m, "data"),
                                     aux["metrics"])
    counters = {k: jax.lax.pmax(aux[k], "data")
                for k in ("n_pairs", "overflow_rect", "overflow_visible",
                          "overflow_pairs")}

    new_state = apply_param_update(state, params, pgrads, tap_grad,
                                   loss, radii, visible, opt,
                                   spatial_lr_scale,
                                   lr_scale=opt.multicam_lr_scale,
                                   vis_count=vis_count)
    return new_state, {"metrics": metrics, **counters}


def make_parallel_train_step_multicam(mesh: Mesh, n_cams: int, stage: str,
                                      hp: ModelHiddenParams,
                                      opt: OptimizationParams,
                                      pipe: PipelineParams,
                                      cfg: RasterConfig,
                                      spatial_lr_scale: float,
                                      use_custom_vjp: bool = True):
    """Returns a jitted (state, camera_groups, active_sh_degree, bg) ->
    (state, aux) step where ``camera_groups`` leaves are
    [n_devices, n_cams, ...] — one same-timestep rig group per device,
    sharded on axis 0."""
    import functools

    n_dev = mesh.shape["data"]
    body = functools.partial(
        _device_step_multicam, stage=stage, hp=hp, opt=opt, pipe=pipe,
        cfg=cfg, spatial_lr_scale=spatial_lr_scale,
        use_custom_vjp=use_custom_vjp, n_dev=n_dev)

    def per_device(state: TrainState, cams: Camera, active_sh_degree,
                   bg: jnp.ndarray):
        # cams arrive as [1(local shard), n_cams, ...]; drop the shard axis
        cams = jax.tree_util.tree_map(lambda x: x[0], cams)
        return body(state, cams, n_cams, active_sh_degree, bg)

    from jax import shard_map

    step = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P("data"), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(step)


def make_parallel_train_steps_scan_multicam(mesh: Mesh, n_cams: int,
                                            stage: str,
                                            hp: ModelHiddenParams,
                                            opt: OptimizationParams,
                                            pipe: PipelineParams,
                                            cfg: RasterConfig,
                                            spatial_lr_scale: float,
                                            use_custom_vjp: bool = True):
    """Scanned multicam-DP dispatch: ``camera_blocks`` leaves are
    [n_steps, n_devices, n_cams, ...] (axis 1 sharded); lax.scan runs
    inside shard_map so the per-step psums ride ICI without host returns."""
    import functools

    n_dev = mesh.shape["data"]
    body = functools.partial(
        _device_step_multicam, stage=stage, hp=hp, opt=opt, pipe=pipe,
        cfg=cfg, spatial_lr_scale=spatial_lr_scale,
        use_custom_vjp=use_custom_vjp, n_dev=n_dev)

    def per_device(state: TrainState, cams: Camera, active_sh_degree,
                   bg: jnp.ndarray):
        cams = jax.tree_util.tree_map(lambda x: x[:, 0], cams)

        def scan_body(s, cam):
            return body(s, cam, n_cams, active_sh_degree, bg)

        return jax.lax.scan(scan_body, state, cams)

    from jax import shard_map

    step = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(None, "data"), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(step)


def make_parallel_train_steps_scan(mesh: Mesh, stage: str,
                                   hp: ModelHiddenParams,
                                   opt: OptimizationParams,
                                   pipe: PipelineParams, cfg: RasterConfig,
                                   spatial_lr_scale: float,
                                   use_custom_vjp: bool = True):
    """Scanned multi-step data-parallel dispatch: the DP analog of
    trainer.train_steps_scan (one device dispatch per BLOCK of steps —
    per-step dispatch over a remote transport costs ~25 ms, VERDICT r2
    weak #5a).

    Returns a jitted (state, camera_blocks, active_sh_degree, bg) ->
    (state, aux) where ``camera_blocks`` is a Camera pytree with leading
    axes [n_steps, n_devices] (axis 1 sharded over the mesh), and the aux
    metric scalars / budget counters carry a leading per-step axis.
    ``lax.scan`` runs INSIDE shard_map, so the psum/pmean collectives ride
    ICI every step without returning to the host."""
    import functools

    n_dev = mesh.shape["data"]
    body = functools.partial(
        _device_step, stage=stage, hp=hp, opt=opt, pipe=pipe, cfg=cfg,
        spatial_lr_scale=spatial_lr_scale, use_custom_vjp=use_custom_vjp,
        n_dev=n_dev)

    def per_device(state: TrainState, cams: Camera, active_sh_degree,
                   bg: jnp.ndarray):
        # cams arrive as [n_steps, 1(local shard), ...]; drop the shard axis
        cams = jax.tree_util.tree_map(lambda x: x[:, 0], cams)

        def scan_body(s, cam):
            return body(s, cam, active_sh_degree, bg)

        return jax.lax.scan(scan_body, state, cams)

    from jax import shard_map

    state_spec = P()
    cam_spec = P(None, "data")    # [step, device, ...]

    step = shard_map(
        per_device, mesh=mesh,
        in_specs=(state_spec, cam_spec, state_spec, state_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False)
    return jax.jit(step)


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


def shard_camera_batch(batch: Camera, mesh: Mesh) -> Camera:
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def shard_camera_blocks(blocks: Camera, mesh: Mesh) -> Camera:
    """[n_steps, n_devices, ...] camera pytree sharded on the device axis
    (input layout of make_parallel_train_steps_scan)."""
    sharding = NamedSharding(mesh, P(None, "data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), blocks)
