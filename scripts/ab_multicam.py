#!/usr/bin/env python
"""Multicam-divergence A/B protocol (BASELINE.md "Round 3: multicam
training divergence + LR correction").

One leg = the 32-frame synthetic street clip (scripts/mini_clip.py,
seed 0), 800 coarse + 2400 fine iterations, opacity reset disabled, with
the leg's camera-batching configuration:

    a  — single-camera reference semantics (batch_size 1)
    b  — --multicam 3 at the reference LRs (multicam_lr_scale 1.0)
    i  — --multicam 3 at the noise-matched LR scale 1/sqrt(3)
    cc — leg-b flags + S3G_MULTICAM_CLONE_CAM=1: every group is B copies
         of ONE camera, so the batched gradient equals the single-camera
         gradient exactly — divergence here = batched-program defect,
         health here = batch statistics/dynamics

All legs share the clip directory (generated once, seeded) so the scene,
init cloud, and schedule are identical; only the batching/LR differ.
The fine-stage train-PSNR trajectory at the probe iterations
{600, 900, 1500, 2400} is the divergence verdict: leg A holds ~31 dB,
leg B collapses below 15 dB (measured r3), and a healthy leg I should
track A.

    python scripts/ab_multicam.py --leg i [--clip /tmp/ab_clip] \
        [--coarse 800 --fine 2400]

Prints `AB_PROBES {...}` (probe iter -> (logged iter, train PSNR)) and
leaves the model at <clip>/recon_<leg> for the eval sweep /
scripts/eval_flow_epe.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PROBES = (600, 900, 1500, 2400)

LEGS = {
    "a": [],
    "b": ["--multicam", "3", "--multicam_lr_scale", "1.0"],
    "i": ["--multicam", "3", "--multicam_lr_scale", "0.5774"],
    "cc": ["--multicam", "3", "--multicam_lr_scale", "1.0"],
}

# per-leg environment (set before the training CLI runs, so the whole
# documented protocol is reproducible from this one entry point)
LEG_ENV = {
    "cc": {"S3G_MULTICAM_CLONE_CAM": "1"},
}


def read_probes(logger_path: str, probes=PROBES):
    """Last fine-stage train PSNR logged at or before each probe iter."""
    out = {p: None for p in probes}
    with open(logger_path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if rec.get("stage") != "fine" or "psnr" not in rec:
                continue
            it = rec.get("step", -1)
            for p in out:
                if it <= p and (out[p] is None or it > out[p][0]):
                    out[p] = (it, rec["psnr"])
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--leg", required=True, choices=sorted(LEGS))
    p.add_argument("--clip", default="/tmp/ab_clip")
    p.add_argument("--coarse", type=int, default=800)
    p.add_argument("--fine", type=int, default=2400)
    args, extra = p.parse_known_args(argv)

    for k, v in LEG_ENV.get(args.leg, {}).items():
        os.environ[k] = v

    import mini_clip

    model_path = os.path.join(args.clip, f"recon_{args.leg}")
    mini_clip.main([
        "--out", args.clip, "--frames", "32", "--train",
        "--coarse", str(args.coarse), "--fine", str(args.fine),
        "--reset_interval", str(10 * (args.coarse + args.fine)),
        "--model_path", model_path,
    ] + LEGS[args.leg] + extra)

    probes = read_probes(os.path.join(model_path, "logger.json"))
    print("AB_PROBES", {p: v for p, v in sorted(probes.items())})
    return probes


if __name__ == "__main__":
    main()
