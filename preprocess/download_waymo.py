#!/usr/bin/env python
"""Fetch Waymo Open Dataset TFRecords for the benchmark splits via gsutil.

Analog of ``data/download_waymo.py`` in the reference: resolves scene ids
(given directly or via a split file in ``data/waymo_splits/``) to segment
filenames in ``waymo_train_list.txt`` and copies them from the
scene-flow training bucket with a small thread pool.

    python preprocess/download_waymo.py --target_dir data/waymo/raw \
        [--scene_ids 16 21 22 | --split_file data/waymo_splits/dynamic32.txt]

Requires prior ``gcloud auth login``.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from concurrent.futures import ThreadPoolExecutor

DEFAULT_SOURCE = "gs://waymo_open_dataset_scene_flow/train"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN_LIST = os.path.join(REPO, "data", "waymo_splits", "waymo_train_list.txt")


def read_split_scene_ids(split_file: str) -> list:
    """Split files are `scene_id,seg_name,start,end,type` with a # header."""
    ids = []
    with open(split_file) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ids.append(int(line.split(",")[0]))
    return ids


def fetch_one(name: str, target_dir: str, source: str) -> None:
    r = subprocess.run(
        ["gsutil", "cp", "-n", f"{source}/{name}.tfrecord", target_dir],
        capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(r.stderr.strip())


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--target_dir", default="data/waymo/raw")
    p.add_argument("--scene_ids", type=int, nargs="+", default=None)
    p.add_argument("--split_file", default=None)
    p.add_argument("--source", default=DEFAULT_SOURCE)
    p.add_argument("--workers", type=int, default=10)
    args = p.parse_args(argv)

    os.makedirs(args.target_dir, exist_ok=True)
    with open(TRAIN_LIST) as f:
        names = [l.strip() for l in f]
    if args.split_file:
        scene_ids = read_split_scene_ids(args.split_file)
    elif args.scene_ids is not None:
        scene_ids = args.scene_ids
    else:
        p.error("pass --scene_ids or --split_file")
    files = [names[i] for i in scene_ids]

    failures = 0
    with ThreadPoolExecutor(max_workers=args.workers) as ex:
        futs = {ex.submit(fetch_one, n, args.target_dir, args.source): n
                for n in files}
        for i, fut in enumerate(futs, 1):
            name = futs[fut]
            try:
                fut.result()
                print(f"[{i}/{len(files)}] {name} ok")
            except Exception as e:  # noqa: BLE001 - report and continue
                failures += 1
                print(f"[{i}/{len(files)}] {name} FAILED: {e}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
