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

import json
import os
import time
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from s3gaussian_tpu.eval.metrics import (lpips_or_none, masked_psnr,
                                         masked_ssim, psnr, ssim_skimage)
from s3gaussian_tpu.eval.visualization import (scene_flow_to_rgb, to8b,
                                               visualize_depth)
from s3gaussian_tpu.render.renderer import render


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

    for cam in cameras:
        pkg = render(cam, pool, deform, hp, pipe, bg, aabb, active_sh_degree,
                     stage=stage, return_decomposition=return_decomposition,
                     return_dx=("fine" in stage), cfg=cfg)
        rgb = np.clip(np.asarray(pkg["render"]).transpose(1, 2, 0), 0, 1)
        gt = np.asarray(cam.image)
        out["rgbs"].append(rgb)
        out["gt_rgbs"].append(gt)
        out["depths"].append(np.asarray(pkg["depth"]))
        if return_decomposition and "render_d" in pkg:
            out["dynamic_rgbs"].append(
                np.clip(np.asarray(pkg["render_d"]).transpose(1, 2, 0), 0, 1))
            out["static_rgbs"].append(
                np.clip(np.asarray(pkg["render_s"]).transpose(1, 2, 0), 0, 1))
        dx_per_cam.append(None if pkg.get("dx") is None
                          else np.asarray(pkg["dx"]))

        if compute_metrics:
            metrics["psnr"].append(float(psnr(jnp.asarray(rgb), jnp.asarray(gt))))
            metrics["ssim"].append(ssim_skimage(rgb, gt))
            metrics["lpips"].append(lpips_or_none(rgb, gt))
            if cam.dynamic_mask is not None:
                m = np.asarray(cam.dynamic_mask)
                if m.any():
                    metrics["masked_psnr"].append(
                        float(masked_psnr(jnp.asarray(rgb), jnp.asarray(gt),
                                          jnp.asarray(m))))
                    metrics["masked_ssim"].append(masked_ssim(rgb, gt, m))

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
            for key, flow in (("forward_flows", fflow),
                              ("backward_flows", bflow)):
                colors = scene_flow_to_rgb(flow, flow_max_radius=2.0)
                pkg = render(cam, pool, deform, hp, pipe, bg, aabb,
                             active_sh_degree, stage=stage,
                             override_color=jnp.asarray(colors), cfg=cfg)
                out[key].append(
                    np.clip(np.asarray(pkg["render"]).transpose(1, 2, 0), 0, 1))

    result = {k: v for k, v in out.items() if v}
    if compute_metrics:
        summary = {}
        for k, v in metrics.items():
            vals = [x for x in v if x is not None]
            summary[k] = float(np.mean(vals)) if vals else None
        result["metrics"] = summary
    return result


def save_videos(frames: Dict[str, List[np.ndarray]], save_pth: str,
                num_timestamps: int, keys=None, num_cams: int = 3,
                fps: int = 24, verbose: bool = False) -> None:
    """Per-key mp4 with the cameras of one timestep tiled side by side
    (video_utils.py:352-499)."""
    import imageio.v2 as imageio

    os.makedirs(save_pth, exist_ok=True)
    keys = keys or [k for k in frames if k != "metrics"]
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
                  save_separate_pcd: bool = False) -> Dict:
    """train.py:61-215: per-split metric JSONs + videos."""
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
                                                  and split == "full"),
                               pcd_dir=os.path.join(eval_dir, "pcd"))
        metrics = frames.get("metrics", {})
        results[split] = metrics
        ts = time.strftime("%Y%m%d%H%M%S")
        with open(os.path.join(eval_dir, "metrics",
                               f"{step}_images_{split}_{ts}.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        if save_video:
            n_t = max(len(cams) // num_cams, 1)
            save_videos(frames, os.path.join(eval_dir, f"{split}_set_{step}"),
                        num_timestamps=n_t, num_cams=num_cams)
    return results
