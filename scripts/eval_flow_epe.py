#!/usr/bin/env python
"""Score a trained checkpoint's deformation field against ground-truth
scene flow (end-point error).

Works on clips whose generator wrote ``gt_motion.json`` (the synthetic
mini-clip knows every object's trajectory; scripts/mini_clip.py).  The
learned flow is the reference's own construction — dx differences across
timesteps (utils/video_utils.py:252-299) — used here as a *measurement*
instead of a visualization (VERDICT r2 weak #3 / next #3).

    python scripts/eval_flow_epe.py --model_path /tmp/mini_clip/recon

Reads cfg_args from the model dir to rebuild the scene exactly as
trained, restores the latest checkpoint, and prints one JSON dict of EPE
metrics per (probe frame, flow offset).
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
    p.add_argument("--source", default="",
                   help="clip dir (default: source_path from cfg_args)")
    p.add_argument("--checkpoint", default="",
                   help="checkpoint dir (default: latest in model_path)")
    p.add_argument("--offsets", nargs="+", type=int, default=[1, 3])
    p.add_argument("--out", default="",
                   help="write the metrics JSON here as well")
    args = p.parse_args(argv)

    with open(os.path.join(args.model_path, "cfg_args")) as f:
        train_args = SimpleNamespace(**ast.literal_eval(f.read()))

    import jax
    from s3gaussian_tpu.config import (ModelHiddenParams, ModelParams,
                                       extract_group)
    from s3gaussian_tpu.data.scene import load_scene
    from s3gaussian_tpu.eval.flow import deformation_flow_epe, load_gt_motion
    from s3gaussian_tpu.models.deformation import init_deformation
    from s3gaussian_tpu.train import checkpoints as ckpt
    from s3gaussian_tpu.train.trainer import init_state

    model = extract_group(ModelParams, train_args)
    hyper = extract_group(ModelHiddenParams, train_args)
    if args.source:
        model.source_path = os.path.abspath(args.source)

    gt_motion = load_gt_motion(model.source_path)
    if gt_motion is None:
        raise SystemExit(f"no gt_motion.json in {model.source_path} — "
                         "flow EPE needs ground-truth trajectories")

    scene = load_scene(model)
    deform = init_deformation(jax.random.PRNGKey(
        getattr(train_args, "seed", 6666)), hyper)
    state = init_state(scene.pool, deform, scene.aabb)

    path = args.checkpoint
    if not path:
        found = ckpt.find_checkpoint(args.model_path)
        if found is None:
            raise SystemExit(f"no checkpoint under {args.model_path}")
        path, stage, it = found
        print(f"using {path} ({stage}:{it})", file=sys.stderr)
    state, _, _ = ckpt.load_checkpoint(path, state)

    n_frames = gt_motion.get("n_frames") or len(
        [f for f in os.listdir(os.path.join(model.source_path, "ego_pose"))
         if f.endswith(".txt")])
    probe = [0, n_frames // 3, 2 * n_frames // 3]
    results = deformation_flow_epe(state.pool, state.deform, hyper,
                                   state.aabb, gt_motion, n_frames,
                                   offsets=tuple(args.offsets),
                                   probe_frames=probe)
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
