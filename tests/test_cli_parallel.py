"""CLI with batch_size > 1 routes through the device-mesh parallel step."""

import json
import os
import sys

import numpy as np
import jax
import pytest


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_train_cli_parallel_batch(tmp_path):
    from waymo_fixture import make_fixture
    src = make_fixture(str(tmp_path / "clip"), n_frames=3)
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import train as train_cli

    train_cli.main([
        "-s", src, "--model_path", out, "--num_pts", "400",
        "--coarse_iterations", "4", "--iterations", "8",
        "--densification_interval", "1000",
        "--opacity_reset_interval", "1000",
        "--checkpoint_iterations", "999",
        "--bench_iters", "4", "--batch_size", "2",
        "--max_visible", "1024", "--rect_w", "4", "--rect_h", "4",
        "--chunk", "32", "--max_pairs_per_tile", "512",
        "--load_h", "64", "--load_w", "96",
        "--configs", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "tiny_config.py"),
    ])
    with open(os.path.join(out, "logger.json")) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    assert lines and all(np.isfinite(l["Loss"]) for l in lines)
