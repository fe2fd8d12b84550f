#!/usr/bin/env python
"""Training CLI — the analog of the reference's ``train.py``:

    python train.py -s <waymo_clip> --model_path out/ [--configs arguments/nvs.py]
        [--eval_only] [--prior_checkpoint out_prev/chkpnt_fine_50000]
        [--start_checkpoint out/chkpnt_coarse_5000]

Runs the two-stage schedule (coarse then fine, train.py:553-641 in the
reference), with densify/prune/opacity-reset cadence, logger.json
telemetry, periodic checkpoints, and the end-of-training evaluation sweep.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

import numpy as np


def auto_max_visible(points, cams, capacity, growth=2.0, lane=2048,
                     group_by_frame=False):
    """Size the render budget NR from the scene's init cloud.

    ``--max_visible 0`` resolves to ``growth``× the largest per-camera
    in-frustum count over the training cameras, lane-rounded and clamped to
    the pool capacity.  The cull_before_deform A/B (BASELINE.md) showed the
    culled path needs a right-sized budget: ~2× the expected visible count
    wins 1.49×, while an oversized budget loses 4.5% to gather overhead.
    The 2× headroom covers densification growth and the ±32 px cull margin.
    Visibility matches the projector's cull (ops/project.py:154-156):
    depth > 0.2 with the 1.3·tan(FOV/2) clamp treated as the frustum edge.

    With ``group_by_frame`` (the multicam path) the budget covers the UNION
    of the frustums of each frame's camera rig, since one compaction serves
    all of a frame's views (render_multicam).
    """
    pts = np.ascontiguousarray(np.asarray(points, np.float32))
    best = 0
    union = {}
    for cam in cams:
        view = np.asarray(cam.world_view, np.float32)
        p = pts @ view[:3, :3] + view[3, :3]
        z = p[:, 2]
        tx = 1.3 * np.tan(0.5 * float(cam.fovx))
        ty = 1.3 * np.tan(0.5 * float(cam.fovy))
        vis = (z > 0.2) & (np.abs(p[:, 0]) < tx * z) & (np.abs(p[:, 1]) < ty * z)
        if group_by_frame:
            k = int(cam.frame_idx)
            union[k] = vis if k not in union else (union[k] | vis)
        else:
            best = max(best, int(vis.sum()))
    if group_by_frame:
        best = max(int(v.sum()) for v in union.values())
    nr = int(np.ceil(growth * best / lane)) * lane
    return max(lane, min(nr, capacity))


def main(argv=None):
    parser = argparse.ArgumentParser(description="S3Gaussian-TPU training")
    from s3gaussian_tpu.config import (ModelHiddenParams, ModelParams,
                                       OptimizationParams, PipelineParams,
                                       RasterConfig, add_group_args,
                                       apply_config_file, extract_group)
    add_group_args(parser, ModelParams, "Loading Parameters")
    add_group_args(parser, OptimizationParams, "Optimization Parameters")
    add_group_args(parser, PipelineParams, "Pipeline Parameters")
    add_group_args(parser, ModelHiddenParams, "ModelHiddenParams")
    add_group_args(parser, RasterConfig, "Rasterizer")
    parser.add_argument("--seed", type=int, default=6666)
    parser.add_argument("--expname", type=str, default="waymo")
    parser.add_argument("--configs", type=str, default="")
    parser.add_argument("--eval_only", action="store_true")
    parser.add_argument("--skip_final_eval", action="store_true",
                        help="skip the end-of-training eval sweep (A/B "
                             "protocol legs read logger.json probes only)")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[30000, 50000])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--prior_checkpoint", type=str, default=None)
    parser.add_argument("--bench_iters", type=int, default=0,
                        help="run only N timed iterations per stage")
    parser.add_argument("--steps_per_dispatch", type=int, default=10,
                        help="scan up to N plain train steps per device "
                             "dispatch (1 = step-by-step)")
    args = parser.parse_args(argv)

    model = extract_group(ModelParams, args)
    opt = extract_group(OptimizationParams, args)
    pipe = extract_group(PipelineParams, args)
    hyper = extract_group(ModelHiddenParams, args)
    cfg = extract_group(RasterConfig, args)
    if args.configs:
        apply_config_file(args.configs, model, pipe, opt, hyper, cfg)

    random.seed(args.seed)
    np.random.seed(args.seed % (2 ** 31))

    import jax
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    # multi-host: no-op single-process; on a pod slice (or with
    # S3G_COORDINATOR/S3G_NUM_PROCESSES/S3G_PROCESS_ID set) this joins the
    # distributed runtime so jax.devices() spans every host and the DP
    # mesh below becomes process-spanning (parallel/multihost.py)
    from s3gaussian_tpu.parallel.multihost import (init_multihost,
                                                   is_primary,
                                                   local_batch_slice,
                                                   sync_hosts)
    proc_id, n_proc = init_multihost()
    if n_proc > 1:
        print(f"multihost: process {proc_id}/{n_proc}, "
              f"{jax.device_count()} global devices")

    from s3gaussian_tpu.data.scene import load_scene
    from s3gaussian_tpu.eval.video import do_evaluation
    from s3gaussian_tpu.models.deformation import init_deformation
    from s3gaussian_tpu.train import checkpoints as ckpt
    from s3gaussian_tpu.train.trainer import (densify_schedule, densify_step,
                                              init_state, opacity_reset_step,
                                              reinit_optimizer, train_step,
                                              train_steps_scan)

    if not model.model_path:
        model.model_path = os.path.join("./output", args.expname)
    os.makedirs(model.model_path, exist_ok=True)
    if is_primary():
        # cfg_args must record the EFFECTIVE configuration — CLI flags
        # with the --configs file merged in — matching the reference,
        # whose merge_hparams mutates args before the dump
        # (train.py:655-656, utils/params_utils.py:1-9).  External tools
        # (scripts/eval_flow_epe.py, offline metrics) rebuild the model
        # from this file alone; dumping pre-merge values would restore
        # checkpoints against the wrong hexplane/MLP shapes.
        import dataclasses as _dc
        dump = dict(vars(args))
        for grp in (model, opt, pipe, hyper, cfg):
            for fld in _dc.fields(grp):
                if not fld.name.startswith("_"):
                    dump[fld.name] = getattr(grp, fld.name)
        with open(os.path.join(model.model_path, "cfg_args"), "w") as f:
            f.write(repr(dump))

    print(f"Loading scene from {model.source_path}")
    scene = load_scene(model, pool_capacity=model.pool_capacity or None)
    print(f"  {len(scene.info.points)} init points, "
          f"{len(scene.get_train_cameras())} train cams, "
          f"{len(scene.get_test_cameras())} test cams, "
          f"extent {scene.cameras_extent:.2f}")
    from s3gaussian_tpu.data.cameras import write_cameras_json
    if is_primary():
        write_cameras_json(os.path.join(model.model_path, "cameras.json"),
                           scene.get_test_cameras(),
                           scene.get_train_cameras())

    deform = init_deformation(jax.random.PRNGKey(args.seed), hyper)
    state = init_state(scene.pool, deform, scene.aabb)
    bg = jnp.asarray([1.0, 1.0, 1.0] if model.white_background else
                     [0.0, 0.0, 0.0])
    if cfg.max_visible == 0:
        cfg.max_visible = auto_max_visible(
            scene.info.points, scene.get_train_cameras(),
            int(scene.pool.xyz.shape[0]),
            group_by_frame=opt.multicam > 1)
        print(f"auto-sized max_visible = {cfg.max_visible}")

    start_stage, start_iter = "coarse", 0
    if args.start_checkpoint:
        state, start_stage, start_iter = ckpt.load_checkpoint(
            args.start_checkpoint, state)
        print(f"resumed from {args.start_checkpoint} at "
              f"{start_stage}:{start_iter}")
    elif args.eval_only:
        # --eval_only without an explicit checkpoint means "evaluate the
        # trained model in model_path" (the reference restores before its
        # sweep, train.py:630-641); evaluating the fresh init here would
        # silently score an untrained model
        found = ckpt.find_checkpoint(model.model_path)
        if found is None:
            raise SystemExit(
                f"--eval_only: no checkpoint under {model.model_path} "
                "(train first, or pass --start_checkpoint)")
        path, start_stage, start_iter = found
        state, start_stage, start_iter = ckpt.load_checkpoint(path, state)
        print(f"--eval_only: restored {path} ({start_stage}:{start_iter})")

    def evaluate(stage, step, st=None):
        st = state if st is None else st
        eval_dir = os.path.join(model.model_path, "eval")
        os.makedirs(eval_dir, exist_ok=True)
        return do_evaluation(
            scene.get_train_cameras(), scene.get_test_cameras(),
            scene.get_full_cameras(), st.pool, st.deform, hyper, pipe,
            bg, st.aabb, model.sh_degree, stage, cfg, eval_dir, step=step,
            write=is_primary())

    if args.eval_only:
        res = evaluate(start_stage if start_iter else "fine",
                       int(state.step))
        print(json.dumps(res, indent=2))
        return

    # multi-device camera-batch data parallelism (batch_size > 1 with a
    # device mesh; the reference's train.py:328-360 batch loop, SURVEY §5.8)
    # — batch_size counts GLOBAL devices, so the same flag scales from one
    # chip to a multi-host pod (every process runs this same script)
    n_dev = jax.device_count()
    use_parallel = opt.batch_size > 1 and n_dev >= opt.batch_size
    if opt.batch_size > 1 and not use_parallel:
        print(f"batch_size={opt.batch_size} needs >= that many devices "
              f"(have {n_dev}); falling back to batch_size=1")

    def scene_reconstruction(state, stage, first_iter, final_iter):
        if first_iter <= 1:
            # fresh stage start = training_setup (reference train.py:222):
            # Adam moments zeroed, LR schedules restart at step 0 (a resume
            # via --start_checkpoint keeps the loaded optimizer state)
            state = reinit_optimizer(state)
        cams = scene.get_train_cameras()
        stack = []
        logger_path = os.path.join(model.model_path, "logger.json")
        ema_loss = 0.0
        rng = jax.random.PRNGKey(args.seed)
        active_sh = 0
        t_start = time.time()
        n_done = 0
        par_step = None
        par_scan = None
        if use_parallel:
            from s3gaussian_tpu.data.cameras import stack_cameras
            from s3gaussian_tpu.parallel.data_parallel import (
                make_mesh, make_parallel_train_step,
                make_parallel_train_steps_scan, replicate_state)
            from s3gaussian_tpu.parallel.multihost import (
                host_local_camera_batch, host_local_camera_blocks)
            mesh = make_mesh(opt.batch_size)
            state = replicate_state(state, mesh)
            # every process pops the SAME camera sequence (identical seed)
            # and materializes only its slice of the global batch
            b_lo, b_hi = local_batch_slice(opt.batch_size)
        # S3G_SEQ_FRAME_ORDER: diagnostic single-camera ordering that pops
        # whole frames — the 3 views of one random frame land on 3
        # CONSECUTIVE optimizer steps.  Gives single-camera training the
        # exact per-frame exposure pattern of --multicam without batching,
        # isolating gradient simultaneity from data order in the multicam
        # divergence bisect (BASELINE.md round-4 multicam section).
        seq_frame_order = bool(os.environ.get("S3G_SEQ_FRAME_ORDER"))

        def group_by_time(cam_list):
            """Same-timestep view-index groups — the ONE frame-identity
            definition shared by --multicam rigs and the
            S3G_SEQ_FRAME_ORDER bisect diagnostic (the comparison is only
            valid if both group frames identically)."""
            by_t = {}
            for i, c in enumerate(cam_list):
                by_t.setdefault(round(float(c.time), 6), []).append(i)
            return list(by_t.values())

        def pop_cam():
            nonlocal stack
            if not stack:
                if seq_frame_order:
                    frames = group_by_time(cams)
                    random.shuffle(frames)
                    for g in frames:
                        random.shuffle(g)
                    # stack pops from the end: keep frames contiguous
                    stack = [i for g in frames for i in g][::-1]
                else:
                    stack = list(range(len(cams)))
                    random.shuffle(stack)
            return cams[stack.pop()]

        # same-timestep camera groups for --multicam (one deformation eval
        # per optimizer step; reference batch loop train.py:328-360 analog).
        # Composes with batch_size>1 data parallelism: each device of the
        # mesh takes one frame's rig group (SURVEY §5.8a — the v5p-8
        # production configuration).
        mc = max(int(opt.multicam), 0)
        use_multicam = mc > 1 and not use_parallel
        if mc > 1:
            from s3gaussian_tpu.data.cameras import stack_cameras as _stack_mc
            from s3gaussian_tpu.train.trainer import (
                train_step_multicam, train_steps_scan_multicam)
            groups = group_by_time(cams)
            gstack = []

            def pop_group():
                nonlocal gstack
                if not gstack:
                    gstack = list(range(len(groups)))
                    random.shuffle(gstack)
                g = groups[gstack.pop()]
                if os.environ.get("S3G_MULTICAM_CLONE_CAM"):
                    # diagnostic: B copies of ONE camera — the batched
                    # gradient then equals the single-camera gradient
                    # exactly (mean of B identical terms), isolating the
                    # batched program's numerics from batch statistics
                    idx = [random.choice(g)] * mc
                else:
                    idx = (random.sample(g, mc) if len(g) >= mc
                           else random.choices(g, k=mc))
                return _stack_mc([cams[i] for i in idx])

        # S3G_LOG_EVERY overrides the reference's 100-iter telemetry
        # cadence (train.py:445-467) — diagnostic runs on slow backends
        # (1-core CPU mesh) need finer progress
        log_every = max(int(os.environ.get("S3G_LOG_EVERY", "100")), 1)

        def event_after(i):
            """Host work runs after step i (log/densify/reset/ckpt/eval) —
            a scanned block must end there."""
            if i % log_every == 0 or i == first_iter or i == 30000:
                return True
            if i in args.checkpoint_iterations:
                return True
            if i < opt.densify_until_iter and (
                    (i > opt.densify_from_iter
                     and i % opt.densification_interval == 0)
                    or i % opt.opacity_reset_interval == 0):
                return True
            if (opt.prune_after_densify and i >= opt.densify_until_iter
                    and i % opt.densification_interval == 0):
                return True
            if model.render_process and not args.bench_iters:
                if ((i < 10000 and i % 1000 == 999)
                        or (i < 30000 and i % 2000 == 1999)
                        or i % 3000 == 2999):
                    return True
            if args.bench_iters and n_done + (i - iteration) >= args.bench_iters:
                return True
            return False

        spd = max(int(args.steps_per_dispatch), 1)
        iteration = first_iter
        while iteration <= final_iter:
            if iteration % 1000 == 0:
                active_sh = min(active_sh + 1, model.sh_degree)
            if use_parallel:
                # scanned block dispatch in DP too (VERDICT r2 weak #5a):
                # one device dispatch per block of steps unless a host
                # event (log/densify/ckpt/SH bump) falls inside it
                block_ok = (spd > 1 and iteration + spd - 1 <= final_iter
                            and not any(event_after(iteration + j)
                                        for j in range(spd - 1))
                            and not any((iteration + j) % 1000 == 0
                                        for j in range(1, spd)))
                sh_t = jnp.asarray(active_sh, jnp.int32)
                # multicam x DP: each mesh device takes one frame's rig
                # group ([B_dev, n_cams, ...] leaves, axis 0 sharded)
                pop_row = pop_group if mc > 1 else pop_cam
                if block_ok:
                    if par_scan is None:
                        if mc > 1:
                            from s3gaussian_tpu.parallel.data_parallel \
                                import make_parallel_train_steps_scan_multicam
                            par_scan = make_parallel_train_steps_scan_multicam(
                                mesh, mc, stage, hyper, opt, pipe, cfg,
                                scene.cameras_extent)
                        else:
                            par_scan = make_parallel_train_steps_scan(
                                mesh, stage, hyper, opt, pipe, cfg,
                                scene.cameras_extent)
                    blocks = stack_cameras(
                        [stack_cameras([pop_row()
                                        for _ in range(opt.batch_size)
                                        ][b_lo:b_hi])
                         for _ in range(spd)])
                    state, aux = par_scan(
                        state, host_local_camera_blocks(blocks, mesh),
                        sh_t, bg)
                    aux = jax.tree_util.tree_map(lambda x: x[-1], aux)
                    n_done += spd
                    iteration += spd - 1
                else:
                    batch = [pop_row() for _ in range(opt.batch_size)
                             ][b_lo:b_hi]
                    if par_step is None:
                        # active_sh is a traced operand (like the scan
                        # path): one compile covers the whole
                        # oneupSHdegree schedule
                        if mc > 1:
                            from s3gaussian_tpu.parallel.data_parallel \
                                import make_parallel_train_step_multicam
                            par_step = make_parallel_train_step_multicam(
                                mesh, mc, stage, hyper, opt, pipe, cfg,
                                scene.cameras_extent)
                        else:
                            par_step = make_parallel_train_step(
                                mesh, stage, hyper, opt, pipe, cfg,
                                scene.cameras_extent)
                    state, aux = par_step(
                        state, host_local_camera_batch(stack_cameras(batch),
                                                       mesh), sh_t, bg)
                    n_done += 1
            else:
                # scan a full block of plain steps in one dispatch when no
                # host-side event (log/densify/ckpt/SH bump) falls inside it
                block_ok = (spd > 1 and iteration + spd - 1 <= final_iter
                            and not any(event_after(iteration + j)
                                        for j in range(spd - 1))
                            and not any((iteration + j) % 1000 == 0
                                        for j in range(1, spd)))
                if use_multicam:
                    if block_ok:
                        from s3gaussian_tpu.data.cameras import \
                            stack_cameras as _stack
                        block = _stack([pop_group() for _ in range(spd)])
                        state, aux = train_steps_scan_multicam(
                            state, block, mc, stage, active_sh, hyper, opt,
                            pipe, cfg, scene.cameras_extent, bg)
                        aux = jax.tree_util.tree_map(lambda x: x[-1], aux)
                        n_done += spd
                        iteration += spd - 1
                    else:
                        state, aux = train_step_multicam(
                            state, pop_group(), mc, stage, active_sh, hyper,
                            opt, pipe, cfg, scene.cameras_extent, bg)
                        n_done += 1
                elif block_ok:
                    from s3gaussian_tpu.data.cameras import stack_cameras \
                        as _stack
                    block = _stack([pop_cam() for _ in range(spd)])
                    state, aux = train_steps_scan(
                        state, block, stage, active_sh, hyper, opt, pipe,
                        cfg, scene.cameras_extent, bg)
                    aux = jax.tree_util.tree_map(lambda x: x[-1], aux)
                    n_done += spd
                    iteration += spd - 1
                else:
                    state, aux = train_step(state, pop_cam(), stage,
                                            active_sh, hyper, opt, pipe,
                                            cfg, scene.cameras_extent, bg)
                    n_done += 1

            if iteration % log_every == 0 or iteration == first_iter:
                m = {k: float(v) for k, v in aux["metrics"].items()}
                ema_loss = 0.4 * m["loss"] + 0.6 * ema_loss
                entry = {"step": iteration, "stage": stage,
                         "Loss": round(ema_loss, 7),
                         "psnr": round(m["psnr"], 2),
                         "point": int(state.pool.n_alive),
                         "n_pairs": int(aux["n_pairs"]),
                         "ovf_rect": int(aux["overflow_rect"]),
                         "ovf_vis": int(aux["overflow_visible"]),
                         "ovf_pairs": int(aux["overflow_pairs"]),
                         "nan_skips": int(state.nan_skips),
                         "it_per_s": round(n_done / (time.time() - t_start), 3)}
                if "radii_max" in aux:
                    entry["radii_max"] = round(float(aux["radii_max"]), 1)
                    entry["n_r20"] = int(aux["n_r20"])
                elif "radii" in aux:
                    rad = np.asarray(aux["radii"], np.float32)
                    vis = np.asarray(aux["visible"])
                    entry["radii_max"] = round(float((rad * vis).max()), 1)
                    entry["n_r20"] = int(((rad > 20.0) & vis).sum())
                if os.environ.get("S3G_PROBE"):
                    from s3gaussian_tpu.train.trainer import probe_pool
                    pr = probe_pool(state, opt, scene.cameras_extent)
                    entry["probe"] = {k: round(float(v), 8)
                                      for k, v in pr.items()}
                print(entry)
                if is_primary():
                    with open(logger_path, "a") as f:
                        json.dump(entry, f)
                        f.write("\n")

            # training snapshots (train.py:477-487 cadence); single-
            # process only — in multihost runs snapshots are skipped
            if model.render_process and not args.bench_iters and n_proc == 1:
                if ((iteration < 10000 and iteration % 1000 == 999)
                        or (iteration < 30000 and iteration % 2000 == 1999)
                        or (iteration % 3000 == 2999)):
                    from s3gaussian_tpu.eval.snapshots import render_training_image
                    render_training_image(
                        model.model_path, stage + "train", iteration,
                        cams[iteration % len(cams)], state.pool, state.deform,
                        hyper, pipe, bg, state.aabb, active_sh, stage, cfg,
                        elapsed=time.time() - t_start)
                    test_cams = scene.get_test_cameras()
                    if test_cams:
                        render_training_image(
                            model.model_path, stage + "test", iteration,
                            test_cams[iteration % len(test_cams)], state.pool,
                            state.deform, hyper, pipe, bg, state.aabb,
                            active_sh, stage, cfg,
                            elapsed=time.time() - t_start)

            # density control (train.py:489-516)
            if iteration < opt.densify_until_iter:
                gthr, othr = densify_schedule(iteration, stage, opt)
                size_thr = 20.0 if iteration > opt.opacity_reset_interval else None
                if (iteration > opt.densify_from_iter
                        and iteration % opt.densification_interval == 0):
                    rng, sub = jax.random.split(rng)
                    state, info = densify_step(state, sub, gthr, othr,
                                               scene.cameras_extent, size_thr,
                                               opt)
                    # per-densify telemetry: alive count + prune-reason
                    # histogram (diagnoses reset->prune interactions)
                    dentry = {"step": iteration, "stage": stage,
                              "densify": {k: int(v) for k, v in
                                          info.items()}}
                    if is_primary():
                        with open(logger_path, "a") as f:
                            json.dump(dentry, f)
                            f.write("\n")
                if iteration % opt.opacity_reset_interval == 0:
                    print("reset opacity")
                    state = opacity_reset_step(state)
                    if is_primary():
                        with open(logger_path, "a") as f:
                            json.dump({"step": iteration, "stage": stage,
                                       "opacity_reset": True}, f)
                            f.write("\n")
            elif (opt.prune_after_densify
                  and iteration % opt.densification_interval == 0):
                # prune-only continuation past densify_until_iter (opt-in
                # TPU-build stability extension; see config.py
                # prune_after_densify): the densify program with an
                # unreachable grad threshold selects zero clones/splits.
                # Opacity + WORLD-size prunes only — the 20-px screen
                # prune removes converged geometry that only active
                # densification replaces (flagship-016 measured a
                # 377k->189k/600-iter death spiral with it on), while
                # the world prune bounds the fog mechanism's unregulated
                # scale growth (legs AN/ANP).
                _, othr = densify_schedule(iteration, stage, opt)
                rng, sub = jax.random.split(rng)
                state, info = densify_step(state, sub, 1e30, othr,
                                           scene.cameras_extent, None,
                                           opt, world_prune=True)
                dentry = {"step": iteration, "stage": stage,
                          "prune_only": {k: int(v) for k, v in
                                         info.items()}}
                if is_primary():
                    with open(logger_path, "a") as f:
                        json.dump(dentry, f)
                        f.write("\n")

            if iteration in args.checkpoint_iterations:
                print(f"[ITER {iteration}] saving checkpoint")
                # collective: every process participates (orbax barriers
                # span processes; primary-only gating deadlocks — see
                # checkpoints.save_checkpoint)
                ckpt.save_checkpoint(model.model_path, stage, iteration,
                                     state)

            # mid-training full evaluation (reference train.py:533-551)
            if iteration == 30000 and not args.bench_iters:
                print(f"[ITER {iteration}] mid-training evaluation")
                res = evaluate(stage, iteration, st=state)
                print(json.dumps(res, indent=2))

            if args.bench_iters and n_done >= args.bench_iters:
                break
            iteration += 1
        return state

    # stage 1: coarse (static)
    if start_stage == "coarse":
        state = scene_reconstruction(state, "coarse", max(start_iter, 0) + 1
                                     if start_iter else 1,
                                     opt.coarse_iterations)
        ckpt.save_checkpoint(model.model_path, "coarse",
                             opt.coarse_iterations, state)
        start_iter = 0

    # cross-clip warm start (train.py:611-624)
    if args.prior_checkpoint:
        print(f"transplanting deformation from {args.prior_checkpoint}")
        state = ckpt.transplant_deformation(args.prior_checkpoint, state)

    # stage 2: fine (dynamic)
    state = scene_reconstruction(state, "fine", start_iter + 1,
                                 opt.iterations)
    ckpt.save_checkpoint(model.model_path, "fine", opt.iterations, state)
    if is_primary():
        ckpt.save_ply_pool(os.path.join(
            model.model_path, "point_cloud",
            f"iteration_{opt.iterations}", "point_cloud.ply"), state.pool)
    sync_hosts("ckpt_fine")

    if not args.bench_iters and not args.skip_final_eval:
        res = evaluate("fine", int(state.step))
        print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
