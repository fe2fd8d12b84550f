#!/usr/bin/env python
"""Offline metric evaluation over saved render directories.

Parity: the reference's ``metrics.py`` (:36-96): pairs ``renders/`` with
``gt/`` per method directory under a model path and writes
results.json / per_view.json with PSNR / SSIM / LPIPS(vgg if weights are
available).

    python metrics.py --model_paths out1 out2 ...
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def read_dir_pairs(renders_dir: str, gt_dir: str):
    from PIL import Image

    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        r = np.asarray(Image.open(os.path.join(renders_dir, fname)).convert("RGB"),
                       np.float32) / 255.0
        g = np.asarray(Image.open(os.path.join(gt_dir, fname)).convert("RGB"),
                       np.float32) / 255.0
        renders.append(r)
        gts.append(g)
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths):
    import jax.numpy as jnp

    from s3gaussian_tpu.eval.metrics import lpips_or_none, psnr, ssim_skimage

    for scene_dir in model_paths:
        print("Scene:", scene_dir)
        full_dict, per_view = {}, {}
        test_dir = os.path.join(scene_dir, "test")
        if not os.path.isdir(test_dir):
            print("  no test/ directory; skipping")
            continue
        for method in os.listdir(test_dir):
            mdir = os.path.join(test_dir, method)
            renders, gts, names = read_dir_pairs(
                os.path.join(mdir, "renders"), os.path.join(mdir, "gt"))
            psnrs = [float(psnr(jnp.asarray(r), jnp.asarray(g)))
                     for r, g in zip(renders, gts)]
            ssims = [ssim_skimage(r, g) for r, g in zip(renders, gts)]
            lpipss = [lpips_or_none(r, g, net="vgg")
                      for r, g in zip(renders, gts)]
            lp = [x for x in lpipss if x is not None]
            full_dict[method] = {
                "PSNR": float(np.mean(psnrs)),
                "SSIM": float(np.mean(ssims)),
                "LPIPS": float(np.mean(lp)) if lp else None,
            }
            per_view[method] = {
                "PSNR": dict(zip(names, psnrs)),
                "SSIM": dict(zip(names, ssims)),
            }
            print(f"  {method}: PSNR {full_dict[method]['PSNR']:.4f} "
                  f"SSIM {full_dict[method]['SSIM']:.4f}")
        with open(os.path.join(scene_dir, "results.json"), "w") as f:
            json.dump(full_dict, f, indent=2)
        with open(os.path.join(scene_dir, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=2)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_paths", "-m", nargs="+", required=True)
    args = parser.parse_args()
    evaluate(args.model_paths)
