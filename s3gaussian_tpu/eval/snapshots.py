"""Training-time image snapshots.

Parity: ``render_training_image`` (utils/scene_utils.py:11-75): a labeled
GT | render | depth strip saved during training at the reference cadence
(train.py:477-487).
"""

from __future__ import annotations

import os

import numpy as np

from s3gaussian_tpu.eval.visualization import to8b, visualize_depth


def render_training_image(model_path: str, tag: str, iteration: int,
                          camera, pool, deform, hp, pipe, bg, aabb,
                          active_sh_degree: int, stage: str, cfg,
                          elapsed: float = 0.0) -> str:
    from PIL import Image, ImageDraw

    # compiled (and cached) render program — see eval/video.py::_jit_render
    from s3gaussian_tpu.eval.video import _jit_render
    from s3gaussian_tpu.eval.video import _slim
    rfn = _jit_render(hp, pipe, cfg, stage, active_sh_degree, False, False,
                      False)
    pkg = rfn(_slim(camera), pool, deform, bg, aabb)
    rgb = np.asarray(pkg["render"])          # [H,W,3] uint8 (see _to8b_dev)
    gt = to8b(np.asarray(camera.image))
    depth = visualize_depth(np.asarray(pkg["depth"]))
    strip = np.concatenate([gt, rgb, depth], axis=1)
    img = Image.fromarray(strip)
    draw = ImageDraw.Draw(img)
    label = (f"{stage} it {iteration}  t={float(camera.time):.2f}  "
             f"elapsed {elapsed:.0f}s")
    draw.text((8, 8), label, fill=(255, 255, 0))
    out_dir = os.path.join(model_path, "train_render")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{tag}_{iteration:05d}.png")
    img.save(path)
    return path
