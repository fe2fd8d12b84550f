#!/usr/bin/env python
"""Preprocessing CLI — parity with the reference's ``preprocess_main.py``:

    python preprocess/preprocess_main.py \
        --data_root <tfrecord dir> --target_dir data/waymo/processed \
        --split_file data/waymo_splits/dynamic32.txt \
        --process_keys images lidar calib pose dynamic_masks \
        --workers 8
"""

from __future__ import annotations

import argparse
import os


def parse_split_file(path: str):
    """Split files list one scene index per line (optionally with a scene
    name after whitespace), like data/waymo_splits/*.txt in the reference."""
    ids = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ids.append(int(line.split()[0]))
    return ids


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", required=True)
    parser.add_argument("--target_dir", required=True)
    parser.add_argument("--split_file", default=None)
    parser.add_argument("--scene_ids", nargs="+", type=int, default=None)
    parser.add_argument("--process_keys", nargs="+",
                        default=["images", "lidar", "calib", "pose",
                                 "dynamic_masks"])
    parser.add_argument("--workers", type=int, default=4)
    args = parser.parse_args(argv)

    from preprocess.waymo_converter import convert

    if args.scene_ids is not None:
        scene_ids = args.scene_ids
    elif args.split_file:
        scene_ids = parse_split_file(args.split_file)
    else:
        scene_ids = list(range(len(os.listdir(args.data_root))))

    os.makedirs(args.target_dir, exist_ok=True)
    convert(args.data_root, args.target_dir, scene_ids, args.process_keys,
            args.workers)


if __name__ == "__main__":
    main()
