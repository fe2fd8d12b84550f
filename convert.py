#!/usr/bin/env python
"""COLMAP conversion helper.

Parity: the reference's ``convert.py`` (Inria 3DGS inheritance): runs
colmap feature extraction / matching / mapping / undistortion over an
``input/`` image folder to produce the ``sparse/`` model the COLMAP reader
consumes.  Requires the ``colmap`` (and optionally ``magick``) binaries on
PATH — exactly like the reference.

    python convert.py -s <location> [--no_gpu] [--skip_matching]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def run(cmd: str) -> None:
    print("+", cmd)
    code = subprocess.call(cmd, shell=True)
    if code != 0:
        print(f"command failed with code {code}; exiting")
        sys.exit(code)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--no_gpu", action="store_true")
    parser.add_argument("--skip_matching", action="store_true")
    parser.add_argument("--camera", default="OPENCV")
    parser.add_argument("--colmap_executable", default="colmap")
    parser.add_argument("--resize", action="store_true")
    parser.add_argument("--magick_executable", default="magick")
    args = parser.parse_args(argv)

    colmap = args.colmap_executable
    use_gpu = 0 if args.no_gpu else 1
    src = args.source_path

    if not args.skip_matching:
        os.makedirs(os.path.join(src, "distorted", "sparse"), exist_ok=True)
        run(f"{colmap} feature_extractor"
            f" --database_path {src}/distorted/database.db"
            f" --image_path {src}/input"
            f" --ImageReader.single_camera 1"
            f" --ImageReader.camera_model {args.camera}"
            f" --SiftExtraction.use_gpu {use_gpu}")
        run(f"{colmap} exhaustive_matcher"
            f" --database_path {src}/distorted/database.db"
            f" --SiftMatching.use_gpu {use_gpu}")
        run(f"{colmap} mapper"
            f" --database_path {src}/distorted/database.db"
            f" --image_path {src}/input"
            f" --output_path {src}/distorted/sparse"
            f" --Mapper.ba_global_function_tolerance=0.000001")

    run(f"{colmap} image_undistorter"
        f" --image_path {src}/input"
        f" --input_path {src}/distorted/sparse/0"
        f" --output_path {src}"
        f" --output_type COLMAP")

    sparse0 = os.path.join(src, "sparse", "0")
    os.makedirs(sparse0, exist_ok=True)
    for f in os.listdir(os.path.join(src, "sparse")):
        full = os.path.join(src, "sparse", f)
        if os.path.isfile(full):
            shutil.move(full, os.path.join(sparse0, f))

    if args.resize:
        for scale, name in ((50, "images_2"), (25, "images_4"),
                            (12.5, "images_8")):
            dst = os.path.join(src, name)
            os.makedirs(dst, exist_ok=True)
            for f in os.listdir(os.path.join(src, "images")):
                shutil.copy2(os.path.join(src, "images", f),
                             os.path.join(dst, f))
                run(f"{args.magick_executable} mogrify -resize {scale}% "
                    f"{os.path.join(dst, f)}")
    print("Done.")


if __name__ == "__main__":
    main()
