#!/usr/bin/env python
"""Per-view PSNR diagnostic for a trained checkpoint.

The 12k-horizon run's training-probe PSNR oscillates 10-38 between
adjacent steps (BASELINE.md r4) — each probe is ONE random camera, so the
oscillation could be a few broken (frame, cam) views rather than global
instability.  This renders every train view and prints per-view PSNR
sorted worst-first plus distribution stats, attributing the tail.

    python scripts/eval_per_view.py --model_path /tmp/ab_clip/recon_h12k
"""
from __future__ import annotations

import argparse
import ast
import json
import os
import sys
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True)
    p.add_argument("--source", default="")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--worst", type=int, default=12)
    args = p.parse_args(argv)

    with open(os.path.join(args.model_path, "cfg_args")) as f:
        train_args = SimpleNamespace(**ast.literal_eval(f.read()))

    import numpy as np
    import jax
    import jax.numpy as jnp
    from s3gaussian_tpu.config import (ModelHiddenParams, ModelParams,
                                       PipelineParams, RasterConfig,
                                       extract_group)
    from s3gaussian_tpu.data.scene import load_scene
    from s3gaussian_tpu.eval.video import render_pixels
    from s3gaussian_tpu.models.deformation import init_deformation
    from s3gaussian_tpu.train import checkpoints as ckpt
    from s3gaussian_tpu.train.trainer import init_state

    model = extract_group(ModelParams, train_args)
    hyper = extract_group(ModelHiddenParams, train_args)
    pipe = extract_group(PipelineParams, train_args)
    cfg = extract_group(RasterConfig, train_args)
    if args.source:
        model.source_path = os.path.abspath(args.source)

    scene = load_scene(model)
    deform = init_deformation(jax.random.PRNGKey(
        getattr(train_args, "seed", 6666)), hyper)
    state = init_state(scene.pool, deform, scene.aabb)
    path = args.checkpoint
    stage = "fine"
    if not path:
        found = ckpt.find_checkpoint(args.model_path)
        if found is None:
            raise SystemExit(f"no checkpoint under {args.model_path}")
        path, stage, it = found
        print(f"using {path} ({stage}:{it})", file=sys.stderr)
    state, _, _ = ckpt.load_checkpoint(path, state)

    cams = scene.get_train_cameras()
    bg = jnp.zeros(3)
    frames = render_pixels(cams, state.pool, state.deform, hyper, pipe, bg,
                           state.aabb, 3, stage, cfg,
                           return_decomposition=False)
    per_view = frames["metrics_per_view"]["psnr"]
    pairs = [(i, v) for i, v in enumerate(per_view) if v is not None]
    if not pairs:
        raise SystemExit("no views with GT images to score")
    psnrs = np.asarray([v for _, v in pairs], dtype=np.float64)
    rows = sorted(
        ({"view": i, "frame": i // 3, "cam": i % 3,
          "time": round(float(cams[i].time), 4),
          "psnr": round(float(v), 2)} for i, v in pairs),
        key=lambda r: r["psnr"])
    print(json.dumps({
        "n_views": len(psnrs),
        "mean": round(float(psnrs.mean()), 2),
        "median": round(float(np.median(psnrs)), 2),
        "p10": round(float(np.percentile(psnrs, 10)), 2),
        "p90": round(float(np.percentile(psnrs, 90)), 2),
        "worst": rows[:args.worst],
        "best": rows[-3:],
    }, indent=2))


if __name__ == "__main__":
    main()
