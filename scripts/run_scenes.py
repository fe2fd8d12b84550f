#!/usr/bin/env python
"""Multi-scene training orchestrator.

The reference drives benchmark sweeps with per-variant shell scripts that
hard-code scene lists and run one scene per GPU by hand
(scripts/dynamic/run_recon_list_d.sh, scripts/static/run_nvs_list.sh,
scripts/stage2/dynamic/run_nvs_list_d1.sh).  This single tool covers the
same matrix:

  * scene selection from a split file (data/waymo_splits/*.txt) or
    explicit directories;
  * phase-1 reconstruction (no config), NVS (arguments/nvs.py /
    static_nvs.py), and phase-2 warm start (arguments/stage2*.py with
    --prior_checkpoint resolved from the phase-1 output of the same
    scene);
  * host-level sharding for fleet runs: ``--shard i/n`` takes every n-th
    scene (the TPU analog of CUDA_VISIBLE_DEVICES=k per invocation).

Examples:
  python scripts/run_scenes.py --data_root data/processed/dynamic32/training \
      --split_file data/waymo_splits/dynamic32.txt --output work_dirs/recon
  python scripts/run_scenes.py --data_root ... --scenes 016 021 \
      --configs arguments/stage2_nvs.py --prior_root work_dirs/recon \
      --output work_dirs/stage2 --shard 0/2
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def scene_ids_from_split(split_file: str):
    ids = []
    with open(split_file) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                ids.append(int(line.split(",")[0]))
    return [f"{i:03d}" for i in ids]


def find_prior_checkpoint(prior_root: str, scene: str):
    d = os.path.join(prior_root, scene)
    if not os.path.isdir(d):
        return None
    cands = [c for c in os.listdir(d) if c.startswith("chkpnt_fine_")]
    if not cands:
        return None
    latest = max(cands, key=lambda c: int(c.split("_")[-1]))
    return os.path.join(d, latest)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True,
                   help="directory containing per-scene clip folders")
    p.add_argument("--scenes", nargs="*", default=None,
                   help="explicit scene folder names (e.g. 016 021)")
    p.add_argument("--split_file", default=None,
                   help="split list in data/waymo_splits/ to select scenes")
    p.add_argument("--output", required=True)
    p.add_argument("--configs", default="",
                   help="arguments/*.py preset passed to train.py")
    p.add_argument("--prior_root", default="",
                   help="phase-1 output root; enables --prior_checkpoint "
                        "chaining per scene (stage-2 warm start)")
    p.add_argument("--shard", default="0/1",
                   help="i/n: run scenes where index %% n == i")
    p.add_argument("--expname", default="waymo")
    p.add_argument("--dry_run", action="store_true")
    p.add_argument("train_args", nargs="*",
                   help="extra args forwarded to train.py verbatim")
    args = p.parse_args(argv)

    if args.split_file:
        scenes = scene_ids_from_split(args.split_file)
    elif args.scenes:
        scenes = args.scenes
    else:
        scenes = sorted(d for d in os.listdir(args.data_root)
                        if os.path.isdir(os.path.join(args.data_root, d)))
    i, n = (int(x) for x in args.shard.split("/"))
    scenes = [s for k, s in enumerate(scenes) if k % n == i]

    os.makedirs(args.output, exist_ok=True)
    summary = []
    for scene in scenes:
        src = os.path.join(args.data_root, scene)
        model_path = os.path.join(args.output, scene)
        cmd = [sys.executable, os.path.join(REPO, "train.py"),
               "-s", src, "--model_path", model_path,
               "--expname", args.expname]
        if args.configs:
            cmd += ["--configs", args.configs]
        if args.prior_root:
            prior = find_prior_checkpoint(args.prior_root, scene)
            if prior is None:
                print(f"[{scene}] no prior checkpoint under "
                      f"{args.prior_root} — skipping")
                summary.append({"scene": scene, "status": "no_prior"})
                continue
            cmd += ["--prior_checkpoint", prior]
        cmd += list(args.train_args)
        print(f"[{scene}] {' '.join(cmd)}")
        if args.dry_run:
            summary.append({"scene": scene, "status": "dry_run"})
            continue
        t0 = time.time()
        rc = subprocess.call(cmd)
        summary.append({"scene": scene, "status": "ok" if rc == 0 else
                        f"rc={rc}", "minutes": round((time.time() - t0) / 60,
                                                     1)})
        with open(os.path.join(args.output, "run_summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    return 0 if all(s["status"] in ("ok", "dry_run") for s in summary) else 1


if __name__ == "__main__":
    sys.exit(main())
