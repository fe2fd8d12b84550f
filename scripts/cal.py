#!/usr/bin/env python
"""Cross-scene metric averaging.

Parity: the reference's ``scripts/cal.py`` (:11-41): scans each model dir's
``eval/metrics/*.json`` for the latest per-split metrics and prints the
average over scenes.

    python scripts/cal.py --root output/ --split test
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def latest_metrics(model_dir: str, split: str):
    files = sorted(glob.glob(os.path.join(model_dir, "eval", "metrics",
                                          f"*_images_{split}_*.json")))
    if not files:
        return None
    with open(files[-1]) as f:
        return json.load(f)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True,
                        help="directory containing per-scene model dirs")
    parser.add_argument("--split", default="test")
    args = parser.parse_args(argv)

    agg = {}
    n = 0
    for d in sorted(os.listdir(args.root)):
        m = latest_metrics(os.path.join(args.root, d), args.split)
        if m is None:
            continue
        n += 1
        for k, v in m.items():
            if v is not None:
                agg.setdefault(k, []).append(v)
        print(d, {k: round(v, 4) for k, v in m.items() if v is not None})
    if n:
        print(f"--- average over {n} scenes ({args.split}) ---")
        print({k: round(float(np.mean(v)), 4) for k, v in agg.items()})


if __name__ == "__main__":
    main()
