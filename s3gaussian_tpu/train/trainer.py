"""Training: jitted step, density control, and the two-stage loop.

Parity target: ``scene_reconstruction`` (train.py:217-551) — identical
loss structure, schedules and density-control cadence:

  loss = L1(rgb)
       + λ_dx·mean|dx| + λ_dshs·mean|dshs|              (fine)
       + λ_depth·masked-L2(normalized depth)
       + hexplane TV/time/L1 regs                       (fine)
       + λ_dssim·(1−SSIM)
       + λ_feat·L2(feat, dino_gt)                       (fine, feat_head)

TPU-first differences:
  * the whole step (render fwd+bwd, Adam, stat accumulation) is ONE
    compiled program over the fixed-capacity pool;
  * densify/prune/opacity-reset are separate jitted programs called at the
    reference cadence — no recompiles, shapes never change;
  * the NaN watchdog skips the update instead of re-exec'ing the process
    (train.py:432-434);
  * the dx / dshs regularizers mask dead pool slots.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

from s3gaussian_tpu.config import (ModelHiddenParams, OptimizationParams,
                                   PipelineParams, RasterConfig)
from s3gaussian_tpu.data.cameras import Camera
from s3gaussian_tpu.models import hexplane as hx
from s3gaussian_tpu.models.pool import (GaussianPool, PoolStats,
                                        add_densification_stats,
                                        densify_and_prune, reset_opacity)
from s3gaussian_tpu.render.renderer import render
from s3gaussian_tpu.train.losses import depth_loss, l1_loss, l2_loss, psnr, ssim
from s3gaussian_tpu.train.lr import expon_lr
from s3gaussian_tpu.train.optim import AdamState, adam_update, init_adam, path_group


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    pool: GaussianPool
    deform: Dict[str, Any]
    adam: AdamState
    stats: PoolStats
    step: jnp.ndarray
    aabb: jnp.ndarray
    nan_skips: jnp.ndarray


def init_state(pool: GaussianPool, deform_params: Dict[str, Any],
               aabb: jnp.ndarray) -> TrainState:
    params = {"pool": pool.param_dict(), "deform": deform_params}
    return TrainState(pool=pool, deform=deform_params,
                      adam=init_adam(params), stats=PoolStats.zeros(pool.capacity),
                      step=jnp.zeros((), jnp.int32), aabb=aabb,
                      nan_skips=jnp.zeros((), jnp.int32))


def clone_state(state: TrainState) -> TrainState:
    """Deep device copy of a TrainState.

    The step functions DONATE their input state (the caller's reference is
    invalidated once the call is dispatched — reading it afterwards raises
    ``Array has been deleted``).  Training loops never notice (they always
    rebind ``state, aux = step(state, ...)``), but code that branches two
    trajectories from one state — A/B tests, parallel-vs-serial parity
    checks, speculative steps — must clone the starting point first."""
    return jax.tree_util.tree_map(jnp.copy, state)


def reinit_optimizer(state: TrainState) -> TrainState:
    """Per-stage ``training_setup`` semantics (reference train.py:222): each
    stage starts with fresh Adam moments and a stage-local step for the LR
    schedules — fine must not inherit coarse's 5,000-step-advanced schedule
    or stale momentum.  Densification stats reset too: training_setup
    zeroes xyz_gradient_accum/denom/max_radii2D (gaussian_model.py:181-185),
    so fine's first densify must not mix coarse-tail accumulations."""
    import dataclasses

    params = {"pool": state.pool.param_dict(), "deform": state.deform}
    return dataclasses.replace(state, adam=init_adam(params),
                               step=jnp.zeros((), jnp.int32),
                               stats=PoolStats.zeros(state.pool.capacity))


def lr_dict(step, opt: OptimizationParams, spatial_lr_scale: float):
    """Scheduled per-group learning rates (gaussian_model.py:186-218)."""
    s = spatial_lr_scale
    return {
        "xyz": expon_lr(step, opt.position_lr_init * s,
                        opt.position_lr_final * s,
                        lr_delay_mult=opt.position_lr_delay_mult,
                        max_steps=opt.position_lr_max_steps),
        "deformation": expon_lr(step, opt.deformation_lr_init * s,
                                opt.deformation_lr_final * s,
                                lr_delay_mult=opt.deformation_lr_delay_mult,
                                max_steps=opt.position_lr_max_steps),
        "grid": expon_lr(step, opt.grid_lr_init * s, opt.grid_lr_final * s,
                         lr_delay_mult=opt.deformation_lr_delay_mult,
                         max_steps=opt.position_lr_max_steps),
        "f_dc": jnp.asarray(opt.feature_lr),
        "f_rest": jnp.asarray(opt.feature_lr / 20.0),
        "opacity": jnp.asarray(opt.opacity_lr),
        "scaling": jnp.asarray(opt.scaling_lr),
        "rotation": jnp.asarray(opt.rotation_lr),
    }


def compute_loss(params: Dict[str, Any], tap: jnp.ndarray, alive: jnp.ndarray,
                 camera: Camera, stage: str, active_sh_degree: int,
                 hp: ModelHiddenParams, opt: OptimizationParams,
                 pipe: PipelineParams, aabb, bg, cfg: RasterConfig,
                 use_custom_vjp: bool = True):
    pool = GaussianPool(
        xyz=params["pool"]["xyz"], features_dc=params["pool"]["f_dc"],
        features_rest=params["pool"]["f_rest"],
        scaling=params["pool"]["scaling"],
        rotation=params["pool"]["rotation"],
        opacity=params["pool"]["opacity"], alive=alive)
    fine = "fine" in stage
    want_feat = fine and hp.feat_head and camera.feat_map is not None
    pkg = render(camera, pool, params["deform"], hp, pipe, bg, aabb,
                 active_sh_degree, stage=stage, return_dx=True,
                 render_feat=want_feat, mean2d_tap=tap, cfg=cfg,
                 use_custom_vjp=use_custom_vjp)

    gt = camera.image.transpose(2, 0, 1)  # [3,H,W]
    loss = l1_loss(pkg["render"], gt)
    metrics = {"l1": loss, "psnr": psnr(pkg["render"], gt)}

    # dx/dshs live on the render working set (the whole pool, or the
    # culled candidate set when cfg.cull_before_deform)
    w_alive = pkg["alive_work"]
    n_alive = jnp.maximum(jnp.sum(w_alive), 1)
    if fine and not hp.no_dx and opt.lambda_dx != 0:
        dx_l = jnp.sum(jnp.where(w_alive[:, None], jnp.abs(pkg["dx"]), 0.0)) \
            / (n_alive * 3)
        loss = loss + opt.lambda_dx * dx_l
        metrics["dx"] = dx_l
    if fine and not hp.no_dshs and opt.lambda_dshs != 0:
        dshs_l = jnp.sum(jnp.where(w_alive[:, None, None],
                                   jnp.abs(pkg["dshs"]), 0.0)) / (n_alive * 48)
        loss = loss + opt.lambda_dshs * dshs_l
    if opt.lambda_depth != 0 and camera.depth_map is not None:
        dl = depth_loss(pkg["depth"], camera.depth_map, "l2")
        loss = loss + opt.lambda_depth * dl
        metrics["depth"] = dl
    if fine and hp.time_smoothness_weight != 0:
        reg = hx.compute_regulation(params["deform"]["grid"],
                                    len(hp.multires),
                                    hp.time_smoothness_weight,
                                    hp.l1_time_planes, hp.plane_tv_weight)
        loss = loss + reg
        metrics["reg"] = reg
    if opt.lambda_dssim != 0:
        s = ssim(pkg["render"], gt)
        loss = loss + opt.lambda_dssim * (1.0 - s)
        metrics["ssim"] = s
    if want_feat:
        gt_feat = camera.feat_map.transpose(2, 0, 1)
        fl = l2_loss(pkg["feat"], gt_feat) * opt.lambda_feat
        loss = loss + fl
        metrics["feat"] = fl

    metrics["loss"] = loss
    aux = {"radii": pkg["radii"],
           "visible": pkg["raster_aux"]["visible"],
           "n_pairs": pkg["raster_aux"]["n_pairs"],
           "overflow_rect": pkg["raster_aux"]["overflow_rect"],
           "overflow_visible": pkg["raster_aux"]["overflow_visible"],
           "overflow_pairs": pkg["raster_aux"]["overflow_pairs"],
           "metrics": metrics}
    return loss, aux


def compute_loss_multicam(params: Dict[str, Any], tap: jnp.ndarray,
                          alive: jnp.ndarray, cameras: Camera, n_cams: int,
                          stage: str, active_sh_degree: int,
                          hp: ModelHiddenParams, opt: OptimizationParams,
                          pipe: PipelineParams, aabb, bg, cfg: RasterConfig,
                          use_custom_vjp: bool = True):
    """Batched loss over ``n_cams`` same-timestep cameras.

    Loss semantics match the reference's ``batch_size>1`` path
    (train.py:362-431), which ``torch.cat``s the batch renders before each
    loss: with equal image shapes that is exactly the pooled mean each term
    below computes on the stacked [B,...] arrays (depth pools the valid
    lidar mask across the batch, like ``compute_depth`` on the cat).  The
    deformation terms (dx/dshs/hexplane reg) appear once — in the reference
    every batch member re-evaluates the same field at its own time; here
    the batch shares one evaluation, which is the entire point (one
    hexplane backward scatter per optimizer step).  The shared ``tap``
    accumulates every camera's screen-gradient, reproducing the reference's
    summed ``viewspace_point_tensor_grad`` (train.py:435-437).
    """
    from s3gaussian_tpu.render.renderer import render_multicam

    pool = GaussianPool(
        xyz=params["pool"]["xyz"], features_dc=params["pool"]["f_dc"],
        features_rest=params["pool"]["f_rest"],
        scaling=params["pool"]["scaling"],
        rotation=params["pool"]["rotation"],
        opacity=params["pool"]["opacity"], alive=alive)
    fine = "fine" in stage
    want_feat = fine and hp.feat_head and cameras.feat_map is not None
    pkg = render_multicam(cameras, n_cams, pool, params["deform"], hp, pipe,
                          bg, aabb, active_sh_degree, stage=stage,
                          render_feat=want_feat, mean2d_tap=tap, cfg=cfg,
                          use_custom_vjp=use_custom_vjp)

    gt = cameras.image.transpose(0, 3, 1, 2)  # [B,3,H,W]
    loss = l1_loss(pkg["render"], gt)
    metrics = {"l1": loss, "psnr": psnr(pkg["render"], gt)}

    w_alive = pkg["alive_work"]
    n_alive = jnp.maximum(jnp.sum(w_alive), 1)
    if fine and not hp.no_dx and opt.lambda_dx != 0:
        dx_l = jnp.sum(jnp.where(w_alive[:, None], jnp.abs(pkg["dx"]), 0.0)) \
            / (n_alive * 3)
        loss = loss + opt.lambda_dx * dx_l
        metrics["dx"] = dx_l
    if fine and not hp.no_dshs and opt.lambda_dshs != 0:
        dshs_l = jnp.sum(jnp.where(w_alive[:, None, None],
                                   jnp.abs(pkg["dshs"]), 0.0)) / (n_alive * 48)
        loss = loss + opt.lambda_dshs * dshs_l
    if opt.lambda_depth != 0 and cameras.depth_map is not None:
        dl = depth_loss(pkg["depth"], cameras.depth_map, "l2")
        loss = loss + opt.lambda_depth * dl
        metrics["depth"] = dl
    if fine and hp.time_smoothness_weight != 0:
        reg = hx.compute_regulation(params["deform"]["grid"],
                                    len(hp.multires),
                                    hp.time_smoothness_weight,
                                    hp.l1_time_planes, hp.plane_tv_weight)
        loss = loss + reg
        metrics["reg"] = reg
    if opt.lambda_dssim != 0:
        s = ssim(pkg["render"], gt)
        loss = loss + opt.lambda_dssim * (1.0 - s)
        metrics["ssim"] = s
    if want_feat:
        gt_feat = cameras.feat_map.transpose(0, 3, 1, 2)
        fl = l2_loss(pkg["feat"], gt_feat) * opt.lambda_feat
        loss = loss + fl
        metrics["feat"] = fl

    metrics["loss"] = loss
    aux = {"radii": pkg["radii"],
           "vis_count": pkg["raster_aux"]["vis_count"],
           "visible": pkg["raster_aux"]["visible"],
           "n_pairs": pkg["raster_aux"]["n_pairs"],
           "overflow_rect": pkg["raster_aux"]["overflow_rect"],
           "overflow_visible": pkg["raster_aux"]["overflow_visible"],
           "overflow_pairs": pkg["raster_aux"]["overflow_pairs"],
           "metrics": metrics}
    return loss, aux


def apply_param_update(state: TrainState, params, pgrads, tap_grad,
                       loss, radii, visible, opt: OptimizationParams,
                       spatial_lr_scale: float,
                       lr_scale: float = 1.0,
                       vis_count=None) -> TrainState:
    """Post-gradient half of a train step, shared by the single-device
    path and the shard_map data-parallel path (which calls this after its
    cross-device reductions): dead-row grad masking, the NaN watchdog,
    scheduled LRs, the Adam update, and densification-stats accumulation.

    When ``vis_count`` is given (multicam per-view stats), ``tap_grad`` is
    the PRECOMPUTED per-point sum of per-camera screen-grad norms [cap]
    and ``vis_count`` the per-point visible-view count — together they
    accumulate exactly what B reference batch_size=1 iterations would.
    """
    # dead pool slots must never move (their placeholder values keep all
    # downstream math finite), so mask their gradients row-wise
    alive = state.pool.alive
    pgrads["pool"] = {
        k: jnp.where(alive.reshape((-1,) + (1,) * (v.ndim - 1)), v, 0.0)
        for k, v in pgrads["pool"].items()}

    # NaN watchdog: skip the whole update on a non-finite loss (zero grads
    # AND zero lr so stale Adam momentum can't move parameters either);
    # the screen-gradient tap must be gated too or one NaN step poisons
    # PoolStats.xyz_grad_accum (NaN + x = NaN) and silently suppresses
    # densification until the next stats reset
    finite = jnp.isfinite(loss)
    pgrads = jax.tree_util.tree_map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), pgrads)
    tap_grad = jnp.where(finite, tap_grad, 0.0)

    fin = finite.astype(jnp.float32) * lr_scale
    lrs = {k: v * fin for k, v in
           lr_dict(state.step, opt, spatial_lr_scale).items()}
    new_params, new_adam = adam_update(
        params, pgrads, state.adam,
        lr_for_leaf=lambda path: lrs[path_group(path)])

    new_pool = state.pool.with_params(new_params["pool"])
    if vis_count is not None:
        new_stats = add_densification_stats(state.stats, None, radii,
                                            visible, grad_norm=tap_grad,
                                            denom_inc=vis_count)
    else:
        new_stats = add_densification_stats(state.stats, tap_grad, radii,
                                            visible)
    return TrainState(pool=new_pool, deform=new_params["deform"],
                      adam=new_adam, stats=new_stats,
                      step=state.step + 1, aabb=state.aabb,
                      nan_skips=state.nan_skips
                      + (1 - finite.astype(jnp.int32)))


def _train_step_impl(state: TrainState, camera: Camera, stage: str,
                     active_sh_degree: int, hp: ModelHiddenParams,
                     opt: OptimizationParams, pipe: PipelineParams,
                     cfg: RasterConfig, spatial_lr_scale: float,
                     bg: jnp.ndarray, use_custom_vjp: bool = True):
    params = {"pool": state.pool.param_dict(), "deform": state.deform}
    tap = jnp.zeros((state.pool.capacity, 2))

    (loss, aux), grads = jax.value_and_grad(
        compute_loss, argnums=(0, 1), has_aux=True)(
            params, tap, state.pool.alive, camera, stage, active_sh_degree,
            hp, opt, pipe, state.aabb, bg, cfg, use_custom_vjp)
    pgrads, tap_grad = grads
    new_state = apply_param_update(state, params, pgrads, tap_grad, loss,
                                   aux["radii"], aux["visible"], opt,
                                   spatial_lr_scale)
    return new_state, aux


def _small_aux(aux):
    """Per-step scalars a scanned block carries out (full [cap] arrays
    would make the scan output step-count × pool-sized).  radii_max /
    n_r20 summarize the current screen-radius distribution — the 20-px
    threshold is the post-reset size-prune prior (reference
    train.py:502-509), so n_r20 counts points that WOULD be size-pruned."""
    radii = aux["radii"].astype(jnp.float32)
    vis = aux["visible"]
    return {"metrics": aux["metrics"],
            "n_pairs": aux["n_pairs"],
            "overflow_rect": aux["overflow_rect"],
            "overflow_visible": aux["overflow_visible"],
            "overflow_pairs": aux["overflow_pairs"],
            "radii_max": jnp.max(jnp.where(vis, radii, 0.0)),
            "n_r20": jnp.sum(((radii > 20.0) & vis).astype(jnp.int32))}


# active_sh_degree is NOT static: the SH evaluation band-masks on a traced
# degree (ops/sh.py:eval_sh_dynamic), so the oneupSHdegree schedule
# (reference train.py:324-325) does not trigger 4 recompiles per stage.
# donate_argnums=0: the caller always rebinds (state, aux = step(state,...)),
# and aliasing the ~4x pool-sized TrainState into the outputs cuts peak HBM
# by the full state size (decisive at the 1.5M LiDAR cap; AOT memory
# analysis in BASELINE.md r3).  Reading a state after passing it to a step
# raises "Array has been deleted" — branch A/B trajectories via
# clone_state.  S3G_NO_DONATE=1 disables donation (debug escape hatch).
import os as _os

_DONATE = () if _os.environ.get("S3G_NO_DONATE") else (0,)

train_step = functools.partial(jax.jit, static_argnames=(
    "stage", "hp", "opt", "pipe", "cfg",
    "spatial_lr_scale", "use_custom_vjp"),
    donate_argnums=_DONATE)(_train_step_impl)


def _train_step_multicam_impl(state: TrainState, cameras: Camera,
                              n_cams: int, stage: str, active_sh_degree,
                              hp: ModelHiddenParams, opt: OptimizationParams,
                              pipe: PipelineParams, cfg: RasterConfig,
                              spatial_lr_scale: float, bg: jnp.ndarray,
                              use_custom_vjp: bool = True):
    """One optimizer step over a same-timestep camera batch (one
    deformation evaluation, ``n_cams`` rasterizations)."""
    params = {"pool": state.pool.param_dict(), "deform": state.deform}
    percam = bool(opt.multicam_percam_stats)
    if percam:
        tap = jnp.zeros((n_cams, state.pool.capacity, 2))
    else:
        tap = jnp.zeros((state.pool.capacity, 2))

    (loss, aux), grads = jax.value_and_grad(
        compute_loss_multicam, argnums=(0, 1), has_aux=True)(
            params, tap, state.pool.alive, cameras, n_cams, stage,
            active_sh_degree, hp, opt, pipe, state.aabb, bg, cfg,
            use_custom_vjp)
    pgrads, tap_grad = grads
    if percam:
        # the batch loss is a mean over B cameras, so each camera's tap
        # gradient is g_b/B; undo the 1/B and accumulate per-view norms
        tap_grad = jnp.sum(jnp.linalg.norm(
            tap_grad[..., :2] * n_cams, axis=-1), axis=0)
    new_state = apply_param_update(state, params, pgrads, tap_grad, loss,
                                   aux["radii"], aux["visible"], opt,
                                   spatial_lr_scale,
                                   lr_scale=opt.multicam_lr_scale,
                                   vis_count=(aux["vis_count"] if percam
                                              else None))
    return new_state, aux


train_step_multicam = functools.partial(jax.jit, static_argnames=(
    "n_cams", "stage", "hp", "opt", "pipe", "cfg",
    "spatial_lr_scale", "use_custom_vjp"),
    donate_argnums=_DONATE)(_train_step_multicam_impl)


@functools.partial(jax.jit, static_argnames=(
    "n_cams", "stage", "hp", "opt", "pipe", "cfg",
    "spatial_lr_scale", "use_custom_vjp"), donate_argnums=_DONATE)
def train_steps_scan_multicam(state: TrainState, camera_blocks: Camera,
                              n_cams: int, stage: str, active_sh_degree,
                              hp: ModelHiddenParams, opt: OptimizationParams,
                              pipe: PipelineParams, cfg: RasterConfig,
                              spatial_lr_scale: float, bg: jnp.ndarray,
                              use_custom_vjp: bool = True):
    """Scanned multicam steps: ``camera_blocks`` leaves are [steps, B, ...]
    (stack_cameras of per-step stack_cameras batches)."""

    def body(s, cams):
        s2, aux = _train_step_multicam_impl(
            s, cams, n_cams, stage, active_sh_degree, hp, opt, pipe, cfg,
            spatial_lr_scale, bg, use_custom_vjp)
        return s2, _small_aux(aux)

    return jax.lax.scan(body, state, camera_blocks)


@functools.partial(jax.jit, static_argnames=(
    "stage", "hp", "opt", "pipe", "cfg",
    "spatial_lr_scale", "use_custom_vjp"), donate_argnums=_DONATE)
def train_steps_scan(state: TrainState, cameras: Camera, stage: str,
                     active_sh_degree: int, hp: ModelHiddenParams,
                     opt: OptimizationParams, pipe: PipelineParams,
                     cfg: RasterConfig, spatial_lr_scale: float,
                     bg: jnp.ndarray, use_custom_vjp: bool = True):
    """Several sequential train steps in ONE compiled program.

    ``cameras`` is a stacked Camera pytree (data.cameras.stack_cameras)
    whose leading axis is the number of steps; ``lax.scan`` threads the
    state through them.  Per-step host dispatch over a remote-device
    transport costs ~25 ms — at ~200 ms/step that is >10% throughput, and
    the reference's cadences (log/densify every 100) leave long untouched
    runs between host-side events.  Returns (state, aux) where the metric
    scalars and budget counters carry a leading per-step axis."""

    def body(s, cam):
        s2, aux = _train_step_impl(s, cam, stage, active_sh_degree, hp, opt,
                                   pipe, cfg, spatial_lr_scale, bg,
                                   use_custom_vjp)
        return s2, _small_aux(aux)

    return jax.lax.scan(body, state, cameras)


@functools.partial(jax.jit, static_argnames=("opt", "max_screen_size",
                                              "scene_extent", "world_prune"))
def densify_step(state: TrainState, rng: jax.Array,
                 grad_threshold, opacity_threshold,
                 scene_extent: float, max_screen_size,
                 opt: OptimizationParams, world_prune=None):
    """Clone+split+prune with Adam-row surgery (train.py:489-516)."""
    opt_rows = {name: (state.adam.mu["pool"][name],
                       state.adam.nu["pool"][name])
                for name in state.pool.param_dict()}
    pool, new_rows, stats, info = densify_and_prune(
        state.pool, opt_rows, state.stats, rng, grad_threshold,
        opacity_threshold, scene_extent, opt.percent_dense, max_screen_size,
        max_points=2_000_000, size_prune_cap=opt.size_prune_cap,
        world_prune=world_prune)
    mu = {"pool": {k: new_rows[k][0] for k in new_rows},
          "deform": state.adam.mu["deform"]}
    nu = {"pool": {k: new_rows[k][1] for k in new_rows},
          "deform": state.adam.nu["deform"]}
    new_state = TrainState(pool=pool, deform=state.deform,
                           adam=AdamState(mu=mu, nu=nu,
                                          count=state.adam.count),
                           stats=stats, step=state.step, aabb=state.aabb,
                           nan_skips=state.nan_skips)
    return new_state, info


@jax.jit
def opacity_reset_step(state: TrainState):
    opt_rows = {name: (state.adam.mu["pool"][name],
                       state.adam.nu["pool"][name])
                for name in state.pool.param_dict()}
    pool, new_rows = reset_opacity(state.pool, opt_rows)
    mu = {"pool": {k: new_rows[k][0] for k in new_rows},
          "deform": state.adam.mu["deform"]}
    nu = {"pool": {k: new_rows[k][1] for k in new_rows},
          "deform": state.adam.nu["deform"]}
    return TrainState(pool=pool, deform=state.deform,
                      adam=AdamState(mu=mu, nu=nu, count=state.adam.count),
                      stats=state.stats, step=state.step, aabb=state.aabb,
                      nan_skips=state.nan_skips)


@functools.partial(jax.jit, static_argnames=("opt", "spatial_lr_scale"))
def probe_pool(state: TrainState, opt: OptimizationParams,
               spatial_lr_scale: float):
    """Diagnostic scalar snapshot of pool/optimizer health.

    Instrumentation for the long-horizon-oscillation investigation
    (BASELINE.md round 5): masked quantiles of the activated opacity and
    world scale, the accumulated max screen radius, and per-param-group
    Adam *effective step sizes* — lr · mean_alive |m̂ / (√v̂ + ε)|, i.e.
    how far Adam actually moves each group per step regardless of raw
    gradient magnitude.  Called off the hot path (log cadence) when
    ``S3G_PROBE=1``; appended to logger.json under ``probe``.
    """
    from s3gaussian_tpu.train.optim import B1, B2, EPS

    alive = state.pool.alive
    op = jax.nn.sigmoid(state.pool.opacity[:, 0])
    ws = jnp.max(jnp.exp(state.pool.scaling), axis=1)

    def mq(x, p):
        return jnp.nanquantile(jnp.where(alive, x, jnp.nan), p)

    out = {
        "op_q01": mq(op, 0.01), "op_q50": mq(op, 0.5),
        "op_q99": mq(op, 0.99),
        "op_lo": jnp.sum(((op < 0.01) & alive).astype(jnp.int32)),
        "ws_q50": mq(ws, 0.5), "ws_q99": mq(ws, 0.99),
        "ws_max": jnp.max(jnp.where(alive, ws, 0.0)),
        "r2d_q99": mq(state.stats.max_radii2d, 0.99),
        "r2d_max": jnp.max(state.stats.max_radii2d),
    }

    lrs = lr_dict(state.step, opt, spatial_lr_scale)
    c = jnp.maximum(state.adam.count.astype(jnp.float32), 1.0)
    c1 = 1 - B1 ** c
    c2 = 1 - B2 ** c
    for name in state.adam.mu["pool"]:
        m = state.adam.mu["pool"][name]
        v = state.adam.nu["pool"][name]
        mag = jnp.abs(m / c1) / (jnp.sqrt(v / c2) + EPS)
        mask = alive.reshape((-1,) + (1,) * (m.ndim - 1))
        mean_mag = (jnp.sum(jnp.where(mask, mag, 0.0))
                    / jnp.maximum(jnp.sum(jnp.where(
                        mask, jnp.ones_like(mag), 0.0)), 1.0))
        out[f"estep_{name}"] = lrs[name] * mean_mag
    for dname in state.adam.mu["deform"]:
        grp = "grid" if dname == "grid" else "deformation"
        tot = jnp.zeros(())
        cnt = jnp.zeros(())
        for m, v in zip(
                jax.tree_util.tree_leaves(state.adam.mu["deform"][dname]),
                jax.tree_util.tree_leaves(state.adam.nu["deform"][dname])):
            mag = jnp.abs(m / c1) / (jnp.sqrt(v / c2) + EPS)
            tot = tot + jnp.sum(mag)
            cnt = cnt + mag.size
        out[f"estep_{dname}"] = lrs[grp] * tot / jnp.maximum(cnt, 1.0)
    out["lr_xyz"] = lrs["xyz"]
    out["lr_grid"] = lrs["grid"]
    out["lr_deformation"] = lrs["deformation"]
    return out


def densify_schedule(iteration: int, stage: str, opt: OptimizationParams):
    """Annealed thresholds (train.py:494-499)."""
    if stage == "coarse":
        return opt.densify_grad_threshold_coarse, opt.opacity_threshold_coarse
    # clamp: the reference only evaluates this while
    # iteration < densify_until_iter (train.py:494-499), so frac <= 1
    # there; prune_after_densify reuses the schedule past that point and
    # must get the end-of-anneal value, not a linear extrapolation below
    # opacity_threshold_fine_after
    frac = min(iteration / max(opt.densify_until_iter, 1), 1.0)
    op_thr = (opt.opacity_threshold_fine_init
              - frac * (opt.opacity_threshold_fine_init
                        - opt.opacity_threshold_fine_after))
    gr_thr = (opt.densify_grad_threshold_fine_init
              - frac * (opt.densify_grad_threshold_fine_init
                        - opt.densify_grad_threshold_after))
    return gr_thr, op_thr
