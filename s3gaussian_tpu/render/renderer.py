"""Scene rendering — the analog of ``gaussian_renderer/__init__.py:render``.

Coarse stage rasterizes the raw pool; fine stage routes raw attributes
through the deformation field first, then applies activations (the
reference order: deformation on *pre-activation* values,
gaussian_renderer/__init__.py:82-101).  Optional second pass renders the
3-channel DINO feature head as colors (:153-166), and the dynamic/static
decomposition re-renders the pool masked by |dx| > mean (:168-204) — with
the fixed-capacity pool these are alive-mask variations, not dynamic-shape
subsets.

Returned dict keys mirror the reference so downstream losses/eval port
directly: render, depth, radii, visibility_filter, viewspace_points (the
NDC gradient tap), dx, dshs, feat, render_d/depth_d, render_s/depth_s.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from s3gaussian_tpu.config import ModelHiddenParams, PipelineParams, RasterConfig
from s3gaussian_tpu.data.cameras import Camera
from s3gaussian_tpu.models.deformation import apply_deformation_ckpt
from s3gaussian_tpu.models.pool import GaussianPool
from s3gaussian_tpu.ops.project import sh_to_color
from s3gaussian_tpu.ops.rasterizer import RasterSettings, rasterize


def make_settings(camera: Camera, bg: jnp.ndarray, sh_degree: int,
                  scaling_modifier: float = 1.0) -> RasterSettings:
    return RasterSettings(
        image_height=camera.image_height, image_width=camera.image_width,
        tanfovx=camera.tanfovx, tanfovy=camera.tanfovy, bg=bg,
        scale_modifier=scaling_modifier, viewmatrix=camera.world_view,
        projmatrix=camera.full_proj, sh_degree=sh_degree,
        campos=camera.campos)


def render(camera: Camera, pool: GaussianPool, deform_params: Optional[Dict],
           hp: ModelHiddenParams, pipe: PipelineParams, bg: jnp.ndarray,
           aabb: Optional[jnp.ndarray] = None, active_sh_degree: int = 3,
           stage: str = "fine", scaling_modifier: float = 1.0,
           override_color: Optional[jnp.ndarray] = None,
           return_decomposition: bool = False, return_dx: bool = False,
           render_feat: bool = False,
           mean2d_tap: Optional[jnp.ndarray] = None,
           cfg: RasterConfig = RasterConfig(),
           use_custom_vjp: bool = True) -> Dict[str, Any]:
    xyz = pool.xyz
    dx = dshs = feat = None
    # the "working set": either the whole pool or (cull_before_deform) the
    # compacted pre-deformation candidate set — all arrays below are
    # working-set shaped, and `alive_w` masks its live members
    alive_w = pool.alive
    work_indices = None
    work_vis0 = None

    use_cull = (cfg.cull_before_deform and "fine" in stage
                and not return_decomposition and override_color is None)
    if use_cull:
        # pass 1: cheap conservative cull on the undeformed pool with a
        # pixel margin absorbing |dx| (deviation documented in PARITY.md)
        from s3gaussian_tpu.ops.compact import take_compact
        from s3gaussian_tpu.ops.project import build_cov3d, project_gaussians

        cov0 = build_cov3d(jnp.exp(pool.scaling), pool.rotation,
                           scaling_modifier)
        proj0 = project_gaussians(
            jax.lax.stop_gradient(xyz), jax.lax.stop_gradient(cov0),
            camera.world_view, camera.full_proj, camera.tanfovx,
            camera.tanfovy, camera.image_width, camera.image_height,
            tile_x=cfg.tile_x, tile_y=cfg.tile_y, alive=pool.alive,
            radius_margin=cfg.cull_margin_px)
        vis0 = proj0.visible
        n = xyz.shape[0]
        nr = min(cfg.max_visible, n)
        key = jnp.where(vis0, jnp.uint32(0), jnp.uint32(1))
        _, order = jax.lax.sort((key, jnp.arange(n, dtype=jnp.int32)),
                                num_keys=1)
        cand = order[:nr]
        alive_w = vis0[cand] & (jnp.arange(nr)
                                < jnp.sum(vis0.astype(jnp.int32)))
        work_indices, work_vis0 = cand, vis0
        xyz = take_compact(pool.xyz, cand, vis0)
        scaling_w = take_compact(pool.scaling, cand, vis0)
        rotation_w = take_compact(pool.rotation, cand, vis0)
        opacity_w = take_compact(pool.opacity, cand, vis0)
        shs = jnp.concatenate(
            [take_compact(pool.features_dc, cand, vis0),
             take_compact(pool.features_rest, cand, vis0)], axis=1)
        if mean2d_tap is not None:
            mean2d_tap = take_compact(mean2d_tap, cand, vis0)
    else:
        scaling_w, rotation_w, opacity_w = (pool.scaling, pool.rotation,
                                            pool.opacity)
        shs = pool.get_features()

    if "coarse" in stage:
        xyz_f, scales_f, rot_f, op_f, shs_f = (xyz, scaling_w, rotation_w,
                                               opacity_w, shs)
    elif "fine" in stage:
        # scalar t: the hexplane takes the uniform-time fast path
        # (matmul grid gradients for the spatiotemporal planes)
        t = camera.time.reshape(())
        out = apply_deformation_ckpt(deform_params, hp, aabb, xyz,
                                     scaling_w, rotation_w, opacity_w,
                                     shs, t)
        xyz_f, scales_f, rot_f, op_f, shs_f = (out.xyz, out.scales,
                                               out.rotations, out.opacity,
                                               out.shs)
        dx, feat, dshs = out.dx, out.feat, out.dshs
    else:
        raise NotImplementedError(stage)

    scales_act = jnp.exp(scales_f)
    rot_act = rot_f / jnp.linalg.norm(rot_f, axis=-1, keepdims=True)
    op_act = jax.nn.sigmoid(op_f)

    if override_color is not None:
        colors = override_color
    elif pipe.convert_SHs_python:
        # reference quirk: view dirs from the *undeformed* positions
        # (gaussian_renderer/__init__.py:115)
        colors = sh_to_color(shs_f, xyz, camera.campos, active_sh_degree)
    else:
        colors = None

    settings = make_settings(camera, bg, active_sh_degree, scaling_modifier)

    def rast(alive_mask):
        return rasterize(settings, xyz_f, op_act[:, 0], scales=scales_act,
                         rotations=rot_act,
                         shs=None if colors is not None else shs_f,
                         colors_precomp=colors, mean2d_tap=mean2d_tap,
                         alive=alive_mask, cfg=cfg,
                         use_custom_vjp=use_custom_vjp)

    color, radii, depth, aux = rast(alive_w)
    if use_cull:
        # expand per-candidate outputs back to pool shape by rank (gather)
        nr = work_indices.shape[0]
        rank = jnp.cumsum(work_vis0.astype(jnp.int32)) - 1
        take = jnp.clip(rank, 0, nr - 1)
        ok = work_vis0 & (rank < nr)
        radii_pool = jnp.where(ok, radii[take], 0)
        visible_pool = ok & aux["visible"][take]
        aux = dict(aux)
        aux["visible"] = visible_pool
        radii = radii_pool
    result: Dict[str, Any] = {
        "render": color,
        "depth": depth,
        "radii": radii,
        "visibility_filter": radii > 0,
        "alive_work": alive_w,
        "raster_aux": aux,
    }

    if render_feat and "fine" in stage and feat is not None:
        feat_color, _, _, _ = rasterize(
            settings, jax.lax.stop_gradient(xyz_f), op_act[:, 0],
            scales=scales_act, rotations=rot_act, colors_precomp=feat,
            alive=alive_w, cfg=cfg, use_custom_vjp=use_custom_vjp)
        result["feat"] = feat_color

    if return_decomposition and dx is not None:
        dx_abs = jnp.abs(dx)
        mx = jnp.max(dx_abs, axis=1)
        denom = jnp.maximum(jnp.sum(pool.alive), 1)
        thr = jnp.sum(jnp.where(pool.alive, mx, 0.0)) / denom
        dyn = (mx > thr) & pool.alive
        color_d, radii_d, depth_d, _ = rast(dyn)
        color_s, radii_s, depth_s, _ = rast(pool.alive & ~dyn)
        result.update({
            "render_d": color_d, "depth_d": depth_d,
            "visibility_filter_d": radii_d > 0,
            "render_s": color_s, "depth_s": depth_s,
            "visibility_filter_s": radii_s > 0,
            "dynamic_mask": dyn,
        })

    if return_dx and "fine" in stage:
        result["dx"] = dx
        result["dshs"] = dshs

    return result


def _multicam_scan_core(cameras, n_cams, pool, pipe, bg, active_sh_degree,
                        cfg, use_custom_vjp, want_feat, xyz, xyz_f,
                        scales_act, rot_act, op_act, shs_f, alive_w,
                        work_indices, work_vis0, use_cull, mean2d_tap,
                        dx, dshs, feat):
    """render_multicam's per-camera pipeline as ONE ``lax.scan`` body.

    The python-unrolled loop stamps B copies of the full rasterization
    graph (projection + binning sorts + Pallas kernels + custom_vjp) into
    the XLA program; at rig scale that made the composed program's cold
    compile 360.6 s (BENCH_r04, VERDICT r4 weak #4).  A scan body
    compiles once.  Execution order, reductions (radii max / visibility
    any / vis_count sum — all commute with the cull unsort, so the
    unsort happens once after the scan), and loss-visible outputs match
    the unrolled path; gradients accumulate across scan iterations for
    every captured operand (xyz_f, the deformation outputs, a shared
    mean2d tap) exactly as the unrolled sum does, modulo fp reduction
    order.

    Per-camera taps ([B, NR, 2]) ride the scan xs; everything else the
    body needs per camera is the stacked Camera pytree itself (scan
    slices the leading axis, replacing index_camera).
    """
    percam_tap = mean2d_tap is not None and mean2d_tap.ndim == 3
    nw = alive_w.shape[0]
    tap_xs = (mean2d_tap if percam_tap
              else jnp.zeros((n_cams, 1), jnp.float32))

    def cam_body(carry, xs):
        cam, tap_b = xs
        radii_c, vis_c, cnt_c, np_c, ovf_c = carry
        settings = make_settings(cam, bg, active_sh_degree)
        colors = (sh_to_color(shs_f, xyz, cam.campos, active_sh_degree)
                  if pipe.convert_SHs_python else None)
        tap_use = (tap_b if percam_tap else mean2d_tap)
        color, radii, depth, aux = rasterize(
            settings, xyz_f, op_act[:, 0], scales=scales_act,
            rotations=rot_act,
            shs=None if colors is not None else shs_f,
            colors_precomp=colors, mean2d_tap=tap_use,
            alive=alive_w, cfg=cfg, use_custom_vjp=use_custom_vjp)
        vis = aux["visible"]
        carry = (jnp.maximum(radii_c, radii), vis_c | vis,
                 cnt_c + vis.astype(jnp.float32),
                 np_c + aux["n_pairs"],
                 {k: jnp.maximum(ovf_c[k], aux[k]) for k in ovf_c})
        outs = {"render": color, "depth": depth}
        if want_feat and feat is not None:
            feat_color, _, _, _ = rasterize(
                settings, jax.lax.stop_gradient(xyz_f), op_act[:, 0],
                scales=scales_act, rotations=rot_act, colors_precomp=feat,
                alive=alive_w, cfg=cfg, use_custom_vjp=use_custom_vjp)
            outs["feat"] = feat_color
        return carry, outs

    init = (jnp.zeros(nw, jnp.int32), jnp.zeros(nw, bool),
            jnp.zeros(nw, jnp.float32), jnp.zeros((), jnp.int32),
            {k: jnp.zeros((), jnp.int32)
             for k in ("overflow_rect", "overflow_visible",
                       "overflow_pairs")})
    (radii_w, vis_w, cnt_w, n_pairs, ovf), outs = jax.lax.scan(
        cam_body, init, (cameras, tap_xs))

    if use_cull:
        # one unsort back to pool shape for the whole batch (the per-
        # camera reductions commute with the gather)
        nr = work_indices.shape[0]
        rank = jnp.cumsum(work_vis0.astype(jnp.int32)) - 1
        take = jnp.clip(rank, 0, nr - 1)
        ok = work_vis0 & (rank < nr)
        radii_red = jnp.where(ok, radii_w[take], 0)
        visible_red = ok & vis_w[take]
        vis_count = jnp.where(ok, cnt_w[take], 0.0)
    else:
        radii_red, visible_red, vis_count = radii_w, vis_w, cnt_w

    result: Dict[str, Any] = {
        "render": outs["render"],
        "depth": outs["depth"],
        "radii": radii_red,
        "visibility_filter": radii_red > 0,
        "alive_work": alive_w,
        "raster_aux": {"visible": visible_red, "vis_count": vis_count,
                       "n_pairs": n_pairs, **ovf},
        "dx": dx,
        "dshs": dshs,
    }
    if "feat" in outs:
        result["feat"] = outs["feat"]
    return result


def index_camera(cams: Camera, b: int) -> Camera:
    """Select camera ``b`` from a stacked Camera pytree (static H/W kept)."""
    return jax.tree_util.tree_map(lambda x: x[b], cams)


def render_multicam(cameras: Camera, n_cams: int, pool: GaussianPool,
                    deform_params: Optional[Dict], hp: ModelHiddenParams,
                    pipe: PipelineParams, bg: jnp.ndarray,
                    aabb: Optional[jnp.ndarray] = None,
                    active_sh_degree: int = 3, stage: str = "fine",
                    render_feat: bool = False,
                    return_decomposition: bool = False,
                    mean2d_tap: Optional[jnp.ndarray] = None,
                    cfg: RasterConfig = RasterConfig(),
                    use_custom_vjp: bool = True) -> Dict[str, Any]:
    """Same-timestep multi-camera render.

    ``cameras`` is a stacked Camera pytree ([B, ...] leaves) whose members
    share one timestep — the Waymo 3-camera rig at one frame.  The
    deformation field is evaluated ONCE for the batch, so its backward pass
    (dominated by the hexplane grid scatter-adds, the single largest step
    component — see BASELINE.md "Round 3: step-time attribution") is paid
    per *timestep* instead of per camera; only the per-camera rasterization
    replicates.  This is the TPU-shaped realization of the reference's
    ``batch_size>1`` camera loop (train.py:328-360): the reference stacks B
    independent renders and backprops them all, re-running the deformation
    B times because its cameras are sampled at arbitrary times.

    With ``cfg.cull_before_deform`` the pre-deformation cull uses the UNION
    of the per-camera frustum visibilities, so one compaction serves every
    view (``cfg.max_visible`` must be sized for the union — train.py's
    auto-sizing handles this when multicam is on).

    Returns per-camera stacked ``render [B,3,H,W]`` / ``depth [B,H,W]`` /
    ``feat [B,3,H,W]``, pool-shaped reduced ``radii`` (elementwise max) and
    ``raster_aux.visible`` (any), summed ``n_pairs``, per-batch max
    overflow counters, and the shared ``dx``/``dshs``/``alive_work``.
    """
    xyz = pool.xyz
    dx = dshs = feat = None
    alive_w = pool.alive
    work_indices = None
    work_vis0 = None
    fine = "fine" in stage

    use_cull = (cfg.cull_before_deform and fine
                and not return_decomposition)
    if use_cull:
        from s3gaussian_tpu.ops.compact import take_compact
        from s3gaussian_tpu.ops.project import build_cov3d, project_gaussians

        cov0 = build_cov3d(jnp.exp(pool.scaling), pool.rotation, 1.0)
        xyz_sg = jax.lax.stop_gradient(xyz)
        cov0_sg = jax.lax.stop_gradient(cov0)
        vis0 = jnp.zeros(xyz.shape[0], bool)
        for b in range(n_cams):
            cam = index_camera(cameras, b)
            proj0 = project_gaussians(
                xyz_sg, cov0_sg, cam.world_view, cam.full_proj, cam.tanfovx,
                cam.tanfovy, cam.image_width, cam.image_height,
                tile_x=cfg.tile_x, tile_y=cfg.tile_y, alive=pool.alive,
                radius_margin=cfg.cull_margin_px)
            vis0 = vis0 | proj0.visible
        n = xyz.shape[0]
        nr = min(cfg.max_visible, n)
        key = jnp.where(vis0, jnp.uint32(0), jnp.uint32(1))
        _, order = jax.lax.sort((key, jnp.arange(n, dtype=jnp.int32)),
                                num_keys=1)
        cand = order[:nr]
        alive_w = vis0[cand] & (jnp.arange(nr)
                                < jnp.sum(vis0.astype(jnp.int32)))
        work_indices, work_vis0 = cand, vis0
        xyz = take_compact(pool.xyz, cand, vis0)
        scaling_w = take_compact(pool.scaling, cand, vis0)
        rotation_w = take_compact(pool.rotation, cand, vis0)
        opacity_w = take_compact(pool.opacity, cand, vis0)
        shs = jnp.concatenate(
            [take_compact(pool.features_dc, cand, vis0),
             take_compact(pool.features_rest, cand, vis0)], axis=1)
        if mean2d_tap is not None:
            if mean2d_tap.ndim == 3:  # per-camera taps [B, cap, 2]
                mean2d_tap = jnp.stack(
                    [take_compact(mean2d_tap[b], cand, vis0)
                     for b in range(n_cams)])
            else:
                mean2d_tap = take_compact(mean2d_tap, cand, vis0)
    else:
        scaling_w, rotation_w, opacity_w = (pool.scaling, pool.rotation,
                                            pool.opacity)
        shs = pool.get_features()

    if "coarse" in stage:
        xyz_f, scales_f, rot_f, op_f, shs_f = (xyz, scaling_w, rotation_w,
                                               opacity_w, shs)
    elif fine:
        t = cameras.time[0].reshape(())  # shared timestep
        out = apply_deformation_ckpt(deform_params, hp, aabb, xyz,
                                     scaling_w, rotation_w, opacity_w,
                                     shs, t)
        xyz_f, scales_f, rot_f, op_f, shs_f = (out.xyz, out.scales,
                                               out.rotations, out.opacity,
                                               out.shs)
        dx, feat, dshs = out.dx, out.feat, out.dshs
    else:
        raise NotImplementedError(stage)

    scales_act = jnp.exp(scales_f)
    rot_act = rot_f / jnp.linalg.norm(rot_f, axis=-1, keepdims=True)
    op_act = jax.nn.sigmoid(op_f)

    if cfg.multicam_scan and not return_decomposition:
        return _multicam_scan_core(
            cameras, n_cams, pool, pipe, bg, active_sh_degree, cfg,
            use_custom_vjp, render_feat and fine, xyz, xyz_f, scales_act,
            rot_act, op_act, shs_f, alive_w, work_indices, work_vis0,
            use_cull, mean2d_tap, dx, dshs, feat)

    colors_list = []
    for b in range(n_cams):
        cam = index_camera(cameras, b)
        if pipe.convert_SHs_python:
            colors_list.append(sh_to_color(shs_f, xyz, cam.campos,
                                           active_sh_degree))
        else:
            colors_list.append(None)

    renders, depths, feats = [], [], []
    radii_red = None
    visible_red = None
    vis_count = None
    n_pairs = jnp.zeros((), jnp.int32)
    ovf = {"overflow_rect": jnp.zeros((), jnp.int32),
           "overflow_visible": jnp.zeros((), jnp.int32),
           "overflow_pairs": jnp.zeros((), jnp.int32)}
    percam_tap = mean2d_tap is not None and mean2d_tap.ndim == 3
    for b in range(n_cams):
        cam = index_camera(cameras, b)
        settings = make_settings(cam, bg, active_sh_degree)
        if cfg.multicam_serialize and renders:
            # order camera b's pipeline after camera b-1's output so XLA
            # cannot keep B pair streams live at once (see RasterConfig)
            xyz_f, _prev = jax.lax.optimization_barrier(
                (xyz_f, renders[-1]))
        color, radii, depth, aux = rasterize(
            settings, xyz_f, op_act[:, 0], scales=scales_act,
            rotations=rot_act,
            shs=None if colors_list[b] is not None else shs_f,
            colors_precomp=colors_list[b],
            mean2d_tap=mean2d_tap[b] if percam_tap else mean2d_tap,
            alive=alive_w, cfg=cfg, use_custom_vjp=use_custom_vjp)
        if use_cull:
            nr = work_indices.shape[0]
            rank = jnp.cumsum(work_vis0.astype(jnp.int32)) - 1
            take = jnp.clip(rank, 0, nr - 1)
            ok = work_vis0 & (rank < nr)
            radii = jnp.where(ok, radii[take], 0)
            vis_pool = ok & aux["visible"][take]
        else:
            vis_pool = aux["visible"]
        renders.append(color)
        depths.append(depth)
        # reference batch semantics (train.py:489-492 under the :328-360
        # loop): radii = elementwise max over the batch, visibility = any
        radii_red = radii if radii_red is None else jnp.maximum(radii_red,
                                                                radii)
        visible_red = vis_pool if visible_red is None else (visible_red
                                                            | vis_pool)
        # per-point count of rig cameras that rendered the point — the
        # denom increment for per-view densification stats (config.py
        # OptimizationParams.multicam_percam_stats)
        vis_f = vis_pool.astype(jnp.float32)
        vis_count = vis_f if vis_count is None else vis_count + vis_f
        n_pairs = n_pairs + aux["n_pairs"]
        for k in ovf:
            ovf[k] = jnp.maximum(ovf[k], aux[k])
        if render_feat and fine and feat is not None:
            feat_color, _, _, _ = rasterize(
                settings, jax.lax.stop_gradient(xyz_f), op_act[:, 0],
                scales=scales_act, rotations=rot_act, colors_precomp=feat,
                alive=alive_w, cfg=cfg, use_custom_vjp=use_custom_vjp)
            feats.append(feat_color)

    result: Dict[str, Any] = {
        "render": jnp.stack(renders),
        "depth": jnp.stack(depths),
        "radii": radii_red,
        "visibility_filter": radii_red > 0,
        "alive_work": alive_w,
        "raster_aux": {"visible": visible_red, "vis_count": vis_count,
                       "n_pairs": n_pairs, **ovf},
        "dx": dx,
        "dshs": dshs,
    }
    if feats:
        result["feat"] = jnp.stack(feats)

    if return_decomposition and dx is not None:
        # |dx| > mean split (gaussian_renderer/__init__.py:168-204),
        # computed once from the shared deformation and re-rendered per
        # camera (no cull in this mode, so dx is pool-shaped)
        dx_abs = jnp.abs(dx)
        mx = jnp.max(dx_abs, axis=1)
        denom = jnp.maximum(jnp.sum(pool.alive), 1)
        thr = jnp.sum(jnp.where(pool.alive, mx, 0.0)) / denom
        dyn = (mx > thr) & pool.alive
        rd, rs, dd, ds_ = [], [], [], []
        for b in range(n_cams):
            cam = index_camera(cameras, b)
            settings = make_settings(cam, bg, active_sh_degree)
            if cfg.multicam_serialize and rd:
                xyz_f, _prev = jax.lax.optimization_barrier(
                    (xyz_f, rd[-1]))
            color_d, _, depth_d, _ = rasterize(
                settings, xyz_f, op_act[:, 0], scales=scales_act,
                rotations=rot_act,
                shs=None if colors_list[b] is not None else shs_f,
                colors_precomp=colors_list[b], alive=dyn, cfg=cfg,
                use_custom_vjp=use_custom_vjp)
            color_s, _, depth_s, _ = rasterize(
                settings, xyz_f, op_act[:, 0], scales=scales_act,
                rotations=rot_act,
                shs=None if colors_list[b] is not None else shs_f,
                colors_precomp=colors_list[b], alive=pool.alive & ~dyn,
                cfg=cfg, use_custom_vjp=use_custom_vjp)
            rd.append(color_d)
            rs.append(color_s)
            dd.append(depth_d)
            ds_.append(depth_s)
        result.update({
            "render_d": jnp.stack(rd), "depth_d": jnp.stack(dd),
            "render_s": jnp.stack(rs), "depth_s": jnp.stack(ds_),
            "dynamic_mask": dyn,
        })
    return result
