"""Full-stack evaluation: per-split metric sweeps, decomposition renders,
scene-flow coloring, and video export.

Parity: ``utils/video_utils.py`` (render_pixels :74-349, save_videos
:352-499) and ``do_evaluation`` (train.py:61-215):

  * every camera rendered with decomposition + dx;
  * PSNR (torch formula), skimage-style SSIM, optional LPIPS, and
    dynamic-mask-restricted PSNR/SSIM;
  * forward/backward scene flow derived from dx at t±3 frame offsets,
    rendered with flow colors via override_color (:252-299);
  * per-key videos at 24 fps, 3-camera rows concatenated per frame.
"""

from __future__ import annotations

import functools
import json
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from s3gaussian_tpu.eval.visualization import (scene_flow_to_rgb, to8b,
                                               visualize_depth)
from s3gaussian_tpu.render.renderer import render


def _slim(cam):
    """Strip per-view rasters the renderer never reads (GT image, lidar
    depth, masks, DINO features) so each jitted render call uploads a few
    KB of camera state instead of ~10 MB per frame — on a remote-device
    transport the uploads, not the compute, dominate the eval sweep."""
    import dataclasses
    return dataclasses.replace(
        cam, image=None, depth_map=None, dynamic_mask=None, sky_mask=None,
        feat_map=None, semantic_mask=None, instance_mask=None, sam_mask=None)


def _to8b_dev(x):
    """[3,H,W] float → [H,W,3] uint8 ON DEVICE: frame downloads shrink 4×
    (the 8-bit quantization adds ~2e-3 dB at 30 dB PSNR — far inside the
    0.1 dB parity budget; videos/PNGs are 8-bit anyway)."""
    x = jnp.clip(x, 0.0, 1.0).transpose(1, 2, 0)
    return jnp.round(x * 255.0).astype(jnp.uint8)


@functools.lru_cache(maxsize=8)
def _jit_render(hp, pipe, cfg, stage, sh_deg, decomp, want_dx,
                with_override, with_metrics=False):
    """One compiled render program per static configuration — the eval
    sweep otherwise dispatches every jnp op individually, which over a
    remote-device transport costs ~25 ms PER OP (seconds per frame).
    hp/pipe/cfg hash by identity; the sweep reuses the same instances.
    Frame outputs come back as [H,W,3] uint8 (see _to8b_dev); with
    with_metrics, PSNR/SSIM (+masked variants when the camera carries a
    dynamic mask) are computed ON DEVICE from the full-precision f32
    render — 8-bit quantization moves skimage-SSIM by ~0.008, beyond the
    0.005 parity budget, so metrics must never see the u8 frames."""
    from s3gaussian_tpu.eval.metrics import (masked_psnr, masked_ssim_jnp,
                                             psnr, ssim_skimage_jnp)
    try:
        # weights trace as constants, so LPIPS also runs on device from
        # the full-precision frame (the u8 download would cost up to
        # 1/510 per pixel — past the ±0.005 LPIPS parity budget)
        from s3gaussian_tpu.eval.lpips_jax import _load_weights, lpips_jnp
        _load_weights("alex")
        have_lpips = True
    except FileNotFoundError:
        have_lpips = False

    def run(cam, pool, deform, bg, aabb, override_color=None):
        pkg = render(cam, pool, deform, hp, pipe, bg, aabb, sh_deg,
                     stage=stage, return_decomposition=decomp,
                     return_dx=want_dx, override_color=override_color,
                     cfg=cfg)
        out = dict(pkg)
        if with_metrics:
            rgbf = jnp.clip(pkg["render"], 0.0, 1.0).transpose(1, 2, 0)
            met = {"psnr": psnr(rgbf, cam.image),
                   "ssim": ssim_skimage_jnp(rgbf, cam.image)}
            if have_lpips:
                met["lpips"] = lpips_jnp(rgbf, cam.image)
            if cam.dynamic_mask is not None:
                met["mask_any"] = jnp.any(cam.dynamic_mask)
                met["masked_psnr"] = masked_psnr(rgbf, cam.image,
                                                 cam.dynamic_mask)
                met["masked_ssim"] = masked_ssim_jnp(rgbf, cam.image,
                                                     cam.dynamic_mask)
            out["metrics"] = met
        for k in ("render", "render_d", "render_s"):
            if out.get(k) is not None:
                out[k] = _to8b_dev(out[k])
        # drop diagnostics the eval sweep never reads (saves downloads)
        for k in ("radii", "visibility_filter", "alive_work", "raster_aux",
                  "visibility_filter_d", "visibility_filter_s", "depth_d",
                  "depth_s", "dynamic_mask", "dshs"):
            out.pop(k, None)
        return out

    if with_override:
        @jax.jit
        def f(cam, pool, deform, bg, aabb, override_color):
            return run(cam, pool, deform, bg, aabb, override_color)
    else:
        @jax.jit
        def f(cam, pool, deform, bg, aabb):
            return run(cam, pool, deform, bg, aabb)
    return f


@functools.lru_cache(maxsize=8)
def _jit_render_mc(hp, pipe, cfg, stage, sh_deg, decomp, n_cams,
                   with_metrics=False):
    """Grouped same-timestep render program: ONE deformation evaluation
    serves the n_cams views of a frame (render_multicam), with per-camera
    on-device metrics — the eval-sweep analog of --multicam. The sweep
    calls this once per FRAME instead of once per camera, cutting the
    hexplane+MLP forward (the per-render fixed cost) to 1/n_cams."""
    from s3gaussian_tpu.eval.metrics import (masked_psnr, masked_ssim_jnp,
                                             psnr, ssim_skimage_jnp)
    from s3gaussian_tpu.render.renderer import render_multicam
    try:
        from s3gaussian_tpu.eval.lpips_jax import _load_weights, lpips_jnp
        _load_weights("alex")
        have_lpips = True
    except FileNotFoundError:
        have_lpips = False

    @jax.jit
    def f(cams, pool, deform, bg, aabb):
        pkg = render_multicam(cams, n_cams, pool, deform, hp, pipe, bg,
                              aabb, sh_deg, stage=stage,
                              return_decomposition=decomp, cfg=cfg)
        out = dict(pkg)
        if with_metrics:
            mets: Dict[str, list] = {}

            def put(k, v):
                mets.setdefault(k, []).append(v)

            for b in range(n_cams):
                rgbf = jnp.clip(pkg["render"][b], 0.0, 1.0).transpose(1, 2, 0)
                img = cams.image[b]
                put("psnr", psnr(rgbf, img))
                put("ssim", ssim_skimage_jnp(rgbf, img))
                if have_lpips:
                    put("lpips", lpips_jnp(rgbf, img))
                if cams.dynamic_mask is not None:
                    m = cams.dynamic_mask[b]
                    put("mask_any", jnp.any(m))
                    put("masked_psnr", masked_psnr(rgbf, img, m))
                    put("masked_ssim", masked_ssim_jnp(rgbf, img, m))
            out["metrics"] = {k: jnp.stack(v) for k, v in mets.items()}
        for k in ("render", "render_d", "render_s"):
            if out.get(k) is not None:
                out[k] = jax.vmap(_to8b_dev)(out[k])
        for k in ("radii", "visibility_filter", "alive_work", "raster_aux",
                  "depth_d", "depth_s", "dynamic_mask", "dshs"):
            out.pop(k, None)
        return out

    return f


def render_pixels(cameras, pool, deform, hp, pipe, bg, aabb,
                  active_sh_degree, stage: str, cfg,
                  compute_metrics: bool = True,
                  return_decomposition: bool = True,
                  num_cams: int = 3,
                  flow_offset: int = 3,
                  save_separate_pcd: bool = False,
                  pcd_dir: str = "") -> Dict[str, List]:
    """Render every camera in a split; collect frames + metrics
    (video_utils.py:74-349)."""
    keys = ["rgbs", "gt_rgbs", "depths", "dynamic_rgbs", "static_rgbs",
            "forward_flows", "backward_flows"]
    out: Dict[str, List] = {k: [] for k in keys}
    metrics = {"psnr": [], "ssim": [], "masked_psnr": [], "masked_ssim": [],
               "lpips": []}
    dx_per_cam = []

    import dataclasses

    def _prep(cam):
        cam_in = _slim(cam)
        if compute_metrics:
            # metrics run on device from the f32 render; the GT image and
            # dynamic mask ride along (everything else stays stripped)
            cam_in = dataclasses.replace(cam_in, image=cam.image,
                                         dynamic_mask=cam.dynamic_mask)
        return cam_in

    # same-timestep frame groups: when the split is frame-major rigs of
    # num_cams views sharing one time (the Waymo layout), render each rig
    # with ONE shared deformation evaluation (_jit_render_mc)
    groups = None
    if num_cams > 1 and len(cameras) >= num_cams \
            and len(cameras) % num_cams == 0:
        cand = [cameras[i:i + num_cams]
                for i in range(0, len(cameras), num_cams)]
        if all(abs(float(c.time) - float(g[0].time)) < 1e-9
               for g in cand for c in g[1:]):
            masks_uniform = all(
                (c.dynamic_mask is None) == (cameras[0].dynamic_mask is None)
                for c in cameras)
            if masks_uniform:
                groups = cand

    # dispatch-ahead window: downloading frame i forces a device sync, so
    # the NEXT frame's render must already be enqueued or the sweep
    # serializes compute behind transfers (advisor r2).  A window of 2
    # keeps one render in flight while bounding on-device frame buffers.
    from collections import deque
    pending: deque = deque()

    def _append_metrics(met, b=None):
        def pick(key):
            return met[key] if b is None else met[key][b]

        metrics["psnr"].append(float(pick("psnr")))
        metrics["ssim"].append(float(pick("ssim")))
        metrics["lpips"].append(float(pick("lpips"))
                                if "lpips" in met else None)
        if "mask_any" in met and bool(pick("mask_any")):
            metrics["masked_psnr"].append(float(pick("masked_psnr")))
            metrics["masked_ssim"].append(float(pick("masked_ssim")))

    def _drain_one():
        cam, pkg = pending.popleft()
        # frames arrive as [H,W,3] uint8 (see _to8b_dev)
        rgb = np.asarray(pkg["render"]).astype(np.float32) / 255.0
        gt = np.asarray(cam.image)
        out["rgbs"].append(rgb)
        out["gt_rgbs"].append(gt)
        out["depths"].append(np.asarray(pkg["depth"]))
        if return_decomposition and "render_d" in pkg:
            out["dynamic_rgbs"].append(
                np.asarray(pkg["render_d"]).astype(np.float32) / 255.0)
            out["static_rgbs"].append(
                np.asarray(pkg["render_s"]).astype(np.float32) / 255.0)
        dx_per_cam.append(None if pkg.get("dx") is None
                          else np.asarray(pkg["dx"]))
        if compute_metrics:
            _append_metrics(jax.device_get(pkg["metrics"]))

    def _drain_group():
        g, pkg = pending.popleft()
        renders = np.asarray(pkg["render"]).astype(np.float32) / 255.0
        depths_np = np.asarray(pkg["depth"])
        rd = rs = None
        if return_decomposition and "render_d" in pkg:
            rd = np.asarray(pkg["render_d"]).astype(np.float32) / 255.0
            rs = np.asarray(pkg["render_s"]).astype(np.float32) / 255.0
        dxs = None if pkg.get("dx") is None else np.asarray(pkg["dx"])
        met = jax.device_get(pkg["metrics"]) if compute_metrics else None
        for b, cam in enumerate(g):
            out["rgbs"].append(renders[b])
            out["gt_rgbs"].append(np.asarray(cam.image))
            out["depths"].append(depths_np[b])
            if rd is not None:
                out["dynamic_rgbs"].append(rd[b])
                out["static_rgbs"].append(rs[b])
            # one shared deformation per frame: dx is identical for the
            # rig's cameras (same t), as in the per-camera path
            dx_per_cam.append(dxs)
            if compute_metrics:
                _append_metrics(met, b)

    if groups is not None:
        from s3gaussian_tpu.data.cameras import stack_cameras
        mcfn = _jit_render_mc(hp, pipe, cfg, stage, active_sh_degree,
                              return_decomposition and "fine" in stage,
                              num_cams, with_metrics=compute_metrics)
        for g in groups:
            gin = stack_cameras([_prep(c) for c in g])
            pending.append((g, mcfn(gin, pool, deform, bg, aabb)))
            if len(pending) >= 2:
                _drain_group()
        while pending:
            _drain_group()
    else:
        rfn = _jit_render(hp, pipe, cfg, stage, active_sh_degree,
                          return_decomposition, "fine" in stage, False,
                          with_metrics=compute_metrics)
        for cam in cameras:
            pending.append((cam, rfn(_prep(cam), pool, deform, bg, aabb)))
            if len(pending) >= 2:
                _drain_one()
        while pending:
            _drain_one()

    # dynamic/static split PLY export keyed on |dx| at the reference's
    # probe view (video_utils.py:243-250 → gaussian_model.py:277-348)
    have_dx = [d for d in dx_per_cam if d is not None]
    if save_separate_pcd and len(have_dx) > 1:
        from s3gaussian_tpu.train.checkpoints import save_ply_split
        probe = have_dx[min(24, len(have_dx) - 1)]
        save_ply_split(os.path.join(pcd_dir, "dynamic.ply"),
                       os.path.join(pcd_dir, "static.ply"), pool, probe)

    # scene flow from dx differences across timesteps (video_utils.py:252-299)
    if any(d is not None for d in dx_per_cam) and len(cameras) > num_cams:
        n = len(cameras)
        for i, cam in enumerate(cameras):
            fwd_j = min(i + flow_offset * num_cams, n - 1)
            bwd_j = max(i - flow_offset * num_cams, 0)
            if dx_per_cam[i] is None:
                continue
            fflow = dx_per_cam[fwd_j] - dx_per_cam[i]
            bflow = dx_per_cam[bwd_j] - dx_per_cam[i]
            ofn = _jit_render(hp, pipe, cfg, stage, active_sh_degree,
                              False, False, True)
            for key, flow in (("forward_flows", fflow),
                              ("backward_flows", bflow)):
                colors = scene_flow_to_rgb(flow, flow_max_radius=2.0)
                pkg = ofn(_slim(cam), pool, deform, bg, aabb,
                          jnp.asarray(colors))
                out[key].append(
                    np.asarray(pkg["render"]).astype(np.float32) / 255.0)

    result = {k: v for k, v in out.items() if v}
    if compute_metrics:
        summary = {}
        for k, v in metrics.items():
            vals = [x for x in v if x is not None]
            summary[k] = float(np.mean(vals)) if vals else None
        result["metrics"] = summary
        # per-view values, index-aligned with ``cameras`` (None where a
        # view had no GT) — the worst-view diagnostic in
        # scripts/eval_per_view.py attributes PSNR tails with these
        result["metrics_per_view"] = {
            k: [None if x is None else float(x) for x in v]
            for k, v in metrics.items()}
    return result


def save_videos(frames: Dict[str, List[np.ndarray]], save_pth: str,
                num_timestamps: int, keys=None, num_cams: int = 3,
                fps: int = 24, verbose: bool = False) -> None:
    """Per-key mp4 with the cameras of one timestep tiled side by side
    (video_utils.py:352-499)."""
    import imageio.v2 as imageio

    os.makedirs(save_pth, exist_ok=True)
    # frame sequences only — render_pixels also returns dict-valued
    # entries ("metrics", "metrics_per_view") that must not be sliced
    keys = keys or [k for k in frames if isinstance(frames[k], list)]
    for key in keys:
        if key not in frames or not frames[key]:
            continue
        seq = frames[key]
        vid = []
        per_t = max(len(seq) // num_timestamps, 1)
        for t in range(num_timestamps):
            row = seq[t * per_t:(t + 1) * per_t]
            if not row:
                break
            if row[0].ndim == 2:  # depth
                row = [visualize_depth(r) for r in row]
                frame = np.concatenate(row, axis=1)
            else:
                frame = to8b(np.concatenate(row, axis=1))
            vid.append(frame)
        path = os.path.join(save_pth, f"{key}.mp4")
        try:
            imageio.mimwrite(path, vid, fps=fps)
        except Exception:
            # no ffmpeg: fall back to per-frame pngs
            from PIL import Image
            for i, f in enumerate(vid):
                Image.fromarray(f).save(
                    os.path.join(save_pth, f"{key}_{i:03d}.png"))


def do_evaluation(train_cams, test_cams, full_cams, pool, deform, hp, pipe,
                  bg, aabb, active_sh_degree, stage, cfg, eval_dir: str,
                  step: int = 0, render_full: bool = True,
                  save_video: bool = True, num_cams: int = 3,
                  save_separate_pcd: bool = False, write: bool = True) -> Dict:
    """train.py:61-215: per-split metric JSONs + videos.

    ``write=False`` computes everything but writes no files — in
    multi-host runs every process must execute the (globally-sharded)
    renders, but only process 0 owns the output directory."""
    if write:
        os.makedirs(os.path.join(eval_dir, "metrics"), exist_ok=True)
    results = {}
    splits = {"test": test_cams, "train": train_cams}
    if render_full:
        splits["full"] = full_cams
    for split, cams in splits.items():
        if not cams:
            continue
        frames = render_pixels(cams, pool, deform, hp, pipe, bg, aabb,
                               active_sh_degree, stage, cfg,
                               num_cams=num_cams,
                               save_separate_pcd=(save_separate_pcd
                                                  and write
                                                  and split == "full"),
                               pcd_dir=os.path.join(eval_dir, "pcd"))
        metrics = frames.get("metrics", {})
        results[split] = metrics
        if not write:
            continue
        ts = time.strftime("%Y%m%d%H%M%S")
        with open(os.path.join(eval_dir, "metrics",
                               f"{step}_images_{split}_{ts}.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        if save_video:
            n_t = max(len(cams) // num_cams, 1)
            save_videos(frames, os.path.join(eval_dir, f"{split}_set_{step}"),
                        num_timestamps=n_t, num_cams=num_cams)
    return results
