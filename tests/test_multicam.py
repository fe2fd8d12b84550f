"""Same-timestep multi-camera batching (train_step_multicam).

The multicam step evaluates the deformation field once per optimizer step
and rasterizes each camera of the batch against it — the TPU-shaped analog
of the reference's batch_size>1 camera loop (train.py:328-360, 362-431):
losses pool over the stacked batch (torch.cat semantics), radii reduce by
elementwise max, visibility by any, and the shared screen-gradient tap
accumulates every camera's contribution (:435-437).

Checks: (a) B=1 multicam == the single-camera loss/grads exactly;
(b) B=2 loss and gradients equal the mean over per-camera losses (the
cat-of-equal-shapes identity); (c) the step descends; (d) the scanned
block matches step-by-step; (e) the union cull path is output-invariant.
"""

import numpy as np
import jax
import jax.numpy as jnp

from s3gaussian_tpu.config import OptimizationParams, RasterConfig
from s3gaussian_tpu.data.cameras import Camera, stack_cameras
from s3gaussian_tpu.ops.transforms import projection_matrix
from s3gaussian_tpu.train.trainer import (compute_loss, compute_loss_multicam,
                                          train_step, train_step_multicam,
                                          train_steps_scan_multicam)

import test_train_e2e as helpers

W = H = helpers.W
CFG = helpers.CFG


def shifted_camera(camera: Camera, dx: float, time=None) -> Camera:
    """A copy of ``camera`` whose view is translated by ``dx`` along x."""
    view = np.asarray(camera.world_view).copy()
    view[3, 0] += dx
    proj = projection_matrix(0.01, 100.0, float(camera.fovx),
                             float(camera.fovy))
    full = view @ np.asarray(proj).T
    import dataclasses
    return dataclasses.replace(
        camera, world_view=jnp.asarray(view), full_proj=jnp.asarray(full),
        campos=jnp.asarray([-view[3, 0], -view[3, 1], -view[3, 2]]),
        time=camera.time if time is None else jnp.asarray(time, jnp.float32))


def _loss_and_grads(fn, *args):
    (loss, aux), grads = jax.value_and_grad(fn, argnums=(0, 1),
                                            has_aux=True)(*args)
    return loss, aux, grads


def test_multicam_b1_matches_single():
    state, camera, hp, pipe, bg = helpers.setup(seed=0)
    opt = OptimizationParams()
    params = {"pool": state.pool.param_dict(), "deform": state.deform}
    tap = jnp.zeros((state.pool.capacity, 2))

    loss1, aux1, g1 = _loss_and_grads(
        compute_loss, params, tap, state.pool.alive, camera, "fine", 0,
        hp, opt, pipe, state.aabb, bg, CFG)
    lossB, auxB, gB = _loss_and_grads(
        compute_loss_multicam, params, tap, state.pool.alive,
        stack_cameras([camera]), 1, "fine", 0, hp, opt, pipe, state.aabb,
        bg, CFG)

    assert np.allclose(float(loss1), float(lossB), rtol=1e-6)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(gB)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-7, err_msg=str(pa))
    np.testing.assert_array_equal(np.asarray(aux1["radii"]),
                                  np.asarray(auxB["radii"]))


def test_multicam_b2_is_mean_of_per_camera():
    state, camera, hp, pipe, bg = helpers.setup(seed=1)
    opt = OptimizationParams()
    opt.lambda_depth = 0.0  # masked-pool vs per-cam mean differ otherwise
    cam2 = shifted_camera(camera, 0.25)
    params = {"pool": state.pool.param_dict(), "deform": state.deform}
    tap = jnp.zeros((state.pool.capacity, 2))

    lA, auxA, gA = _loss_and_grads(
        compute_loss, params, tap, state.pool.alive, camera, "fine", 0,
        hp, opt, pipe, state.aabb, bg, CFG)
    lB, auxB, gB = _loss_and_grads(
        compute_loss, params, tap, state.pool.alive, cam2, "fine", 0,
        hp, opt, pipe, state.aabb, bg, CFG)
    lM, auxM, gM = _loss_and_grads(
        compute_loss_multicam, params, tap, state.pool.alive,
        stack_cameras([camera, cam2]), 2, "fine", 0, hp, opt, pipe,
        state.aabb, bg, CFG)

    # the deformation terms (dx/dshs/reg) are identical per camera, so the
    # pooled loss equals the mean of the two per-camera losses
    assert np.allclose(float(lM), 0.5 * (float(lA) + float(lB)), rtol=1e-5)
    mean_g = jax.tree_util.tree_map(lambda a, b: 0.5 * (a + b), gA, gB)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(mean_g),
            jax.tree_util.tree_leaves_with_path(gM)):
        # identical math, different accumulation order; the hexplane grid
        # computes in bf16 (hp.grid_compute_bf16) so the floor is a bf16
        # ulp of the accumulated magnitudes, not an f32 one
        scale = max(float(jnp.abs(a).max()), 1e-8)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3,
                                   atol=max(3e-5 * scale, 1e-5),
                                   err_msg=str(pa))
    # reference reductions: radii = max, visible = any (train.py:489-492)
    np.testing.assert_array_equal(
        np.asarray(auxM["radii"]),
        np.maximum(np.asarray(auxA["radii"]), np.asarray(auxB["radii"])))
    np.testing.assert_array_equal(
        np.asarray(auxM["visible"]),
        np.asarray(auxA["visible"]) | np.asarray(auxB["visible"]))


def yawed_camera(camera: Camera, target_pool, deform, hp, pipe, bg, aabb,
                 yaw: float, tx: float = 0.0) -> Camera:
    """A rig-style camera: rotated ``yaw`` about the vertical axis and
    offset ``tx``, with its own GT image + depth rendered from the target
    scene.  Unlike ``shifted_camera`` this changes the ROTATION — the Waymo
    rig's side cameras differ from FRONT by a ±45° yaw, and translated-only
    batches cannot catch defects in per-camera orientation handling."""
    import dataclasses
    c, s = np.cos(yaw), np.sin(yaw)
    c2w = np.array([[c, 0, s, tx], [0, 1, 0, 0],
                    [-s, 0, c, 0], [0, 0, 0, 1]], np.float32)
    w2c = np.linalg.inv(c2w)
    view = w2c.T.astype(np.float32)
    proj = projection_matrix(0.01, 100.0, float(camera.fovx),
                             float(camera.fovy))
    full = (view @ np.asarray(proj).T).astype(np.float32)
    cam = dataclasses.replace(
        camera, world_view=jnp.asarray(view), full_proj=jnp.asarray(full),
        campos=jnp.asarray(c2w[:3, 3]), image=None, depth_map=None)
    from s3gaussian_tpu.render.renderer import render
    pkg = render(cam, target_pool, deform, hp, pipe, bg, aabb, 0,
                 stage="coarse", cfg=CFG)
    gt = jnp.clip(pkg["render"], 0, 1).transpose(1, 2, 0)
    return dataclasses.replace(cam, image=gt, depth_map=pkg["depth"])


def test_multicam_b3_yawed_rig_matches_sequential_oracle():
    """Full-loss parity of the batched multicam program against an oracle
    that renders each camera with the single-camera ``render()`` and
    assembles the identical pooled loss — with ROTATED rig cameras (yaw
    0/±0.35) and the depth term ON (pooled valid mask, torch.cat
    semantics).  Divergence here = defect in the batched program; this is
    the CPU companion of the TPU clone-cam bisect (BASELINE.md round-4
    multicam section)."""
    from s3gaussian_tpu.render.renderer import render
    from s3gaussian_tpu.train.losses import (depth_loss, l1_loss, psnr,
                                             ssim)
    from s3gaussian_tpu.models import hexplane as hx
    from s3gaussian_tpu.models.pool import GaussianPool

    state, camera, hp, pipe, bg = helpers.setup(seed=11, n=60)
    # target scene for GT renders of the yawed views
    from scenes import random_scene
    from s3gaussian_tpu.models.pool import create_from_pcd
    sc = random_scene(n=60, seed=11, w=W, h=H, zrange=(2.0, 6.0),
                      scale_range=(0.1, 0.25), opacity_range=(0.5, 0.9))
    target = create_from_pcd(sc["means"], sc["colors"], 256)
    opt = OptimizationParams()
    cams = [yawed_camera(camera, target, state.deform, hp, pipe, bg,
                         state.aabb, yaw, tx)
            for yaw, tx in ((0.0, 0.0), (0.35, 0.2), (-0.35, -0.2))]
    # each view must actually see content or the parity claim is vacuous
    for c in cams:
        assert float(jnp.mean(c.image)) > 0.01

    params = {"pool": state.pool.param_dict(), "deform": state.deform}
    tap = jnp.zeros((state.pool.capacity, 2))
    batch = stack_cameras(cams)

    def oracle(params, tap, alive):
        """B sequential single-camera renders + the pooled (cat) loss —
        the semantics compute_loss_multicam documents."""
        pool = GaussianPool(
            xyz=params["pool"]["xyz"], features_dc=params["pool"]["f_dc"],
            features_rest=params["pool"]["f_rest"],
            scaling=params["pool"]["scaling"],
            rotation=params["pool"]["rotation"],
            opacity=params["pool"]["opacity"], alive=alive)
        pkgs = [render(c, pool, params["deform"], hp, pipe, bg, state.aabb,
                       0, stage="fine", return_dx=True, mean2d_tap=tap,
                       cfg=CFG) for c in cams]
        renders = jnp.stack([p["render"] for p in pkgs])
        depths = jnp.stack([p["depth"] for p in pkgs])
        gts = jnp.stack([c.image.transpose(2, 0, 1) for c in cams])
        loss = l1_loss(renders, gts)
        w_alive = pkgs[0]["alive_work"]
        n_alive = jnp.maximum(jnp.sum(w_alive), 1)
        dx_l = jnp.sum(jnp.where(w_alive[:, None],
                                 jnp.abs(pkgs[0]["dx"]), 0.0)) / (n_alive * 3)
        loss = loss + opt.lambda_dx * dx_l
        dshs_l = jnp.sum(jnp.where(w_alive[:, None, None],
                                   jnp.abs(pkgs[0]["dshs"]), 0.0)) \
            / (n_alive * 48)
        loss = loss + opt.lambda_dshs * dshs_l
        gt_d = jnp.stack([c.depth_map for c in cams])
        loss = loss + opt.lambda_depth * depth_loss(depths, gt_d, "l2")
        loss = loss + hx.compute_regulation(
            params["deform"]["grid"], len(hp.multires),
            hp.time_smoothness_weight, hp.l1_time_planes,
            hp.plane_tv_weight)
        loss = loss + opt.lambda_dssim * (1.0 - ssim(renders, gts))
        return loss, pkgs

    (l_o, pkgs), g_o = jax.value_and_grad(oracle, argnums=(0, 1),
                                          has_aux=True)(
        params, tap, state.pool.alive)
    l_m, aux_m, g_m = _loss_and_grads(
        compute_loss_multicam, params, tap, state.pool.alive, batch, 3,
        "fine", 0, hp, opt, pipe, state.aabb, bg, CFG)

    assert np.allclose(float(l_o), float(l_m), rtol=1e-5), (l_o, l_m)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_o),
            jax.tree_util.tree_leaves_with_path(g_m)):
        scale = max(float(jnp.abs(a).max()), 1e-8)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3,
                                   atol=max(3e-5 * scale, 1e-5),
                                   err_msg=str(pa))
    # batch reductions: radii = elementwise max, visible = any
    radii_max = np.maximum.reduce([np.asarray(p["radii"]) for p in pkgs])
    vis_any = np.logical_or.reduce(
        [np.asarray(p["raster_aux"]["visible"]) for p in pkgs])
    np.testing.assert_array_equal(np.asarray(aux_m["radii"]), radii_max)
    np.testing.assert_array_equal(np.asarray(aux_m["visible"]), vis_any)


def test_multicam_step_descends():
    state, camera, hp, pipe, bg = helpers.setup(seed=2)
    opt = OptimizationParams()
    batch = stack_cameras([camera, shifted_camera(camera, 0.15)])
    losses = []
    for _ in range(12):
        state, aux = train_step_multicam(state, batch, 2, "fine", 0, hp,
                                         opt, pipe, CFG, 1.0, bg)
        losses.append(float(aux["metrics"]["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.nan_skips) == 0


def test_multicam_scan_matches_stepwise():
    state, camera, hp, pipe, bg = helpers.setup(seed=3)
    opt = OptimizationParams()
    batch = stack_cameras([camera, shifted_camera(camera, 0.15)])
    blocks = stack_cameras([batch, batch, batch])

    from s3gaussian_tpu.train.trainer import clone_state
    # the scan donates its input; branch the stepwise chain from a clone
    s_scan, aux = train_steps_scan_multicam(clone_state(state), blocks, 2,
                                            "fine", 0, hp, opt, pipe, CFG,
                                            1.0, bg)
    s_step = state
    for _ in range(3):
        s_step, _ = train_step_multicam(s_step, batch, 2, "fine", 0, hp,
                                        opt, pipe, CFG, 1.0, bg)
    np.testing.assert_allclose(np.asarray(s_scan.pool.xyz),
                               np.asarray(s_step.pool.xyz), rtol=1e-5,
                               atol=1e-7)
    assert aux["metrics"]["loss"].shape == (3,)


def test_multicam_lr_scale_scales_first_update():
    """opt.multicam_lr_scale multiplies every group's LR in the multicam
    step only: Adam's first-step delta is lr * m/(sqrt(v)+eps), so halving
    the scale halves the parameter delta exactly."""
    import dataclasses as dc

    from s3gaussian_tpu.train.trainer import clone_state

    state, camera, hp, pipe, bg = helpers.setup(seed=7)
    opt1 = OptimizationParams()
    opt_h = dc.replace(opt1, multicam_lr_scale=0.5) if dc.is_dataclass(
        opt1) else None
    if opt_h is None:
        import copy
        opt_h = copy.deepcopy(opt1)
        opt_h.multicam_lr_scale = 0.5
    batch = stack_cameras([camera, shifted_camera(camera, 0.15)])

    x0 = np.asarray(state.pool.xyz).copy()
    s1, _ = train_step_multicam(clone_state(state), batch, 2, "fine", 0,
                                hp, opt1, pipe, CFG, 1.0, bg)
    sh, _ = train_step_multicam(state, batch, 2, "fine", 0, hp, opt_h,
                                pipe, CFG, 1.0, bg)
    d1 = np.asarray(s1.pool.xyz) - x0
    dh = np.asarray(sh.pool.xyz) - x0
    assert np.abs(d1).max() > 0
    # f32: the extra lr multiply re-rounds the schedule value
    np.testing.assert_allclose(dh, 0.5 * d1, rtol=5e-3, atol=1e-8)


def test_eval_grouped_sweep_matches_per_camera():
    """render_pixels with same-timestep rigs takes the grouped
    (shared-deformation) path; metrics and frames must match the
    per-camera path."""
    from s3gaussian_tpu.eval.video import render_pixels

    state, camera, hp, pipe, bg = helpers.setup(seed=5)
    import dataclasses
    cam_b = shifted_camera(camera, 0.2)
    # 2 frames x 2 cams, frame-major, same time within each frame
    cams = [dataclasses.replace(camera, time=jnp.asarray(0.1, jnp.float32)),
            dataclasses.replace(cam_b, time=jnp.asarray(0.1, jnp.float32)),
            dataclasses.replace(camera, time=jnp.asarray(0.6, jnp.float32)),
            dataclasses.replace(cam_b, time=jnp.asarray(0.6, jnp.float32))]

    kw = dict(pool=state.pool, deform=state.deform, hp=hp, pipe=pipe, bg=bg,
              aabb=state.aabb, active_sh_degree=0, stage="fine", cfg=CFG,
              compute_metrics=True, return_decomposition=True)
    grouped = render_pixels(cams, num_cams=2, **kw)
    single = render_pixels(cams, num_cams=1, **kw)

    for k in ("psnr", "ssim"):
        np.testing.assert_allclose(grouped["metrics"][k],
                                   single["metrics"][k], rtol=1e-4,
                                   err_msg=k)
    for k in ("rgbs", "depths", "dynamic_rgbs", "static_rgbs"):
        assert len(grouped[k]) == len(single[k]) == 4, k
        for a, b in zip(grouped[k], single[k]):
            np.testing.assert_allclose(a, b, atol=5e-3, err_msg=k)


def test_multicam_serialize_is_output_invariant():
    """cfg.multicam_serialize only constrains XLA scheduling — loss and
    gradients must be identical to the unordered path."""
    import dataclasses
    state, camera, hp, pipe, bg = helpers.setup(seed=7)
    opt = OptimizationParams()
    batch = stack_cameras([camera, shifted_camera(camera, 0.2)])
    params = {"pool": state.pool.param_dict(), "deform": state.deform}
    tap = jnp.zeros((state.pool.capacity, 2))

    l0, _, g0 = _loss_and_grads(
        compute_loss_multicam, params, tap, state.pool.alive, batch, 2,
        "fine", 0, hp, opt, pipe, state.aabb, bg, CFG)
    cfg_s = dataclasses.replace(CFG, multicam_serialize=True)
    l1, _, g1 = _loss_and_grads(
        compute_loss_multicam, params, tap, state.pool.alive, batch, 2,
        "fine", 0, hp, opt, pipe, state.aabb, bg, cfg_s)
    assert np.allclose(float(l0), float(l1), rtol=1e-6)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5,
                                   atol=1e-7, err_msg=str(pa))


def test_remat_deform_matches_stored_residuals():
    """hp.remat_deform recomputes the deformation in the backward pass —
    loss and every gradient must match the stored-residual path (same
    math, only the autodiff schedule changes)."""
    state, camera, hp, pipe, bg = helpers.setup(seed=6)
    opt = OptimizationParams()
    params = {"pool": state.pool.param_dict(), "deform": state.deform}
    tap = jnp.zeros((state.pool.capacity, 2))

    l0, _, g0 = _loss_and_grads(
        compute_loss, params, tap, state.pool.alive, camera, "fine", 0,
        hp, opt, pipe, state.aabb, bg, CFG)
    hp_r = helpers.small_hp()
    hp_r.remat_deform = True
    l1, _, g1 = _loss_and_grads(
        compute_loss, params, tap, state.pool.alive, camera, "fine", 0,
        hp_r, opt, pipe, state.aabb, bg, CFG)

    assert np.allclose(float(l0), float(l1), rtol=1e-6)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        scale = max(float(jnp.abs(a).max()), 1e-8)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4,
                                   atol=max(1e-5 * scale, 1e-6),
                                   err_msg=str(pa))


def test_multicam_union_cull_is_output_invariant():
    import dataclasses
    state, camera, hp, pipe, bg = helpers.setup(seed=4)
    opt = OptimizationParams()
    batch = stack_cameras([camera, shifted_camera(camera, 0.3)])
    params = {"pool": state.pool.param_dict(), "deform": state.deform}
    tap = jnp.zeros((state.pool.capacity, 2))

    cfg_cull = dataclasses.replace(CFG, cull_before_deform=True,
                                   max_visible=state.pool.capacity,
                                   cull_margin_px=48.0)
    l0, aux0, g0 = _loss_and_grads(
        compute_loss_multicam, params, tap, state.pool.alive, batch, 2,
        "fine", 0, hp, opt, pipe, state.aabb, bg, CFG)
    l1, aux1, g1 = _loss_and_grads(
        compute_loss_multicam, params, tap, state.pool.alive, batch, 2,
        "fine", 0, hp, opt, pipe, state.aabb, bg, cfg_cull)
    assert np.allclose(float(l0), float(l1), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=2e-6, err_msg=str(pa))


def test_multicam_scan_matches_unrolled():
    """cfg.multicam_scan (lax.scan body, compile-time fix for the rig
    program) must reproduce the unrolled loop: losses, gradients (incl.
    per-camera tap grads), and the reference reductions (radii max /
    visible any / vis_count sum)."""
    import dataclasses

    state, camera, hp, pipe, bg = helpers.setup(seed=4)
    opt = OptimizationParams()
    cams = stack_cameras([camera, shifted_camera(camera, 0.25),
                          shifted_camera(camera, -0.25)])
    params = {"pool": state.pool.param_dict(), "deform": state.deform}
    cfg_scan = dataclasses.replace(CFG, multicam_scan=True)

    for tap in (jnp.zeros((3, state.pool.capacity, 2)),   # per-camera
                jnp.zeros((state.pool.capacity, 2))):     # shared
        lU, auxU, gU = _loss_and_grads(
            compute_loss_multicam, params, tap, state.pool.alive, cams, 3,
            "fine", 0, hp, opt, pipe, state.aabb, bg, CFG)
        lS, auxS, gS = _loss_and_grads(
            compute_loss_multicam, params, tap, state.pool.alive, cams, 3,
            "fine", 0, hp, opt, pipe, state.aabb, bg, cfg_scan)
        assert np.allclose(float(lU), float(lS), rtol=1e-6)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(gU),
                jax.tree_util.tree_leaves_with_path(gS)):
            scale = max(float(jnp.abs(a).max()), 1e-8)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-4,
                atol=max(1e-5 * scale, 1e-7), err_msg=str(pa))
        np.testing.assert_array_equal(np.asarray(auxU["radii"]),
                                      np.asarray(auxS["radii"]))
        np.testing.assert_array_equal(np.asarray(auxU["visible"]),
                                      np.asarray(auxS["visible"]))
        np.testing.assert_array_equal(np.asarray(auxU["vis_count"]),
                                      np.asarray(auxS["vis_count"]))
        assert int(auxU["n_pairs"]) == int(auxS["n_pairs"])


def test_multicam_scan_matches_unrolled_cull():
    """Scan + cull_before_deform: the single post-scan unsort must equal
    the unrolled per-camera unsort + reduce."""
    import dataclasses

    state, camera, hp, pipe, bg = helpers.setup(seed=5)
    opt = OptimizationParams()
    cams = stack_cameras([camera, shifted_camera(camera, 0.3)])
    params = {"pool": state.pool.param_dict(), "deform": state.deform}
    tap = jnp.zeros((2, state.pool.capacity, 2))
    cfg_cull = dataclasses.replace(CFG, cull_before_deform=True,
                                   max_visible=state.pool.capacity,
                                   cull_margin_px=48.0)
    cfg_cull_scan = dataclasses.replace(cfg_cull, multicam_scan=True)

    lU, auxU, gU = _loss_and_grads(
        compute_loss_multicam, params, tap, state.pool.alive, cams, 2,
        "fine", 0, hp, opt, pipe, state.aabb, bg, cfg_cull)
    lS, auxS, gS = _loss_and_grads(
        compute_loss_multicam, params, tap, state.pool.alive, cams, 2,
        "fine", 0, hp, opt, pipe, state.aabb, bg, cfg_cull_scan)
    assert np.allclose(float(lU), float(lS), rtol=1e-6)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(gU),
            jax.tree_util.tree_leaves_with_path(gS)):
        scale = max(float(jnp.abs(a).max()), 1e-8)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4,
            atol=max(1e-5 * scale, 1e-7), err_msg=str(pa))
    np.testing.assert_array_equal(np.asarray(auxU["radii"]),
                                  np.asarray(auxS["radii"]))
    np.testing.assert_array_equal(np.asarray(auxU["visible"]),
                                  np.asarray(auxS["visible"]))
    np.testing.assert_array_equal(np.asarray(auxU["vis_count"]),
                                  np.asarray(auxS["vis_count"]))
