"""Full CLI smoke test over the fabricated Waymo fixture: a handful of
coarse+fine iterations, checkpoint save, eval sweep with videos."""

import json
import os
import sys

import numpy as np
import pytest


def test_train_cli_smoke(tmp_path):
    from waymo_fixture import make_fixture
    src = make_fixture(str(tmp_path / "clip"), n_frames=3)
    out = str(tmp_path / "out")

    sys.argv[:1] = ["train.py"]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import train as train_cli

    train_cli.main([
        "-s", src, "--model_path", out, "--num_pts", "500",
        "--coarse_iterations", "6", "--iterations", "12",
        "--densification_interval", "4", "--densify_from_iter", "2",
        "--opacity_reset_interval", "1000",
        "--checkpoint_iterations", "12",
        "--bench_iters", "6",
        "--max_visible", "2048", "--rect_w", "4", "--rect_h", "4",
        "--chunk", "32", "--max_pairs_per_tile", "512",
        "--load_h", "64", "--load_w", "96",
        "--configs", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "tiny_config.py"),
    ])

    assert os.path.exists(os.path.join(out, "logger.json"))
    with open(os.path.join(out, "logger.json")) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    loss_lines = [l for l in lines if "Loss" in l]
    assert loss_lines and all(np.isfinite(l["Loss"]) for l in loss_lines)
    # densify telemetry lines carry the prune-reason histogram
    dlines = [l for l in lines if "densify" in l]
    assert dlines and all("n_prune_screen" in l["densify"] for l in dlines)
    assert any(d.startswith("chkpnt_") for d in os.listdir(out))


def test_train_cli_multicam_smoke(tmp_path):
    """--multicam 3 batches each frame's 3-camera rig into one optimizer
    step (scan + single-step dispatch paths both exercised)."""
    from waymo_fixture import make_fixture
    src = make_fixture(str(tmp_path / "clip"), n_frames=3)
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import train as train_cli

    train_cli.main([
        "-s", src, "--model_path", out, "--num_pts", "400",
        "--coarse_iterations", "4", "--iterations", "8",
        "--densification_interval", "4", "--densify_from_iter", "2",
        "--opacity_reset_interval", "1000",
        "--checkpoint_iterations", "8",
        "--bench_iters", "4", "--multicam", "3",
        "--steps_per_dispatch", "2",
        "--max_visible", "2048", "--rect_w", "4", "--rect_h", "4",
        "--chunk", "32", "--max_pairs_per_tile", "512",
        "--load_h", "64", "--load_w", "96",
        "--configs", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "tiny_config.py"),
    ])

    with open(os.path.join(out, "logger.json")) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    loss_lines = [l for l in lines if "Loss" in l]
    assert loss_lines and all(np.isfinite(l["Loss"]) for l in loss_lines)


def test_train_cli_waymo_perf_preset(tmp_path):
    """The shipping TPU preset (arguments/waymo_perf.py) composes
    cull_before_deform + auto-sized max_visible (0) + multicam 3 +
    the 1/sqrt(3) LR correction — run the REAL preset file through the
    CLI (merged with the tiny hexplane for CPU compile speed) so the
    full composition is exercised, not just each knob in isolation."""
    from waymo_fixture import make_fixture
    src = make_fixture(str(tmp_path / "clip"), n_frames=3)
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import train as train_cli

    perf = {}
    with open(os.path.join(repo, "arguments", "waymo_perf.py")) as f:
        exec(f.read(), perf)
    tiny = {}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tiny_config.py")) as f:
        exec(f.read(), tiny)
    merged = str(tmp_path / "merged_config.py")
    with open(merged, "w") as f:
        f.write(f"RasterConfig = {perf['RasterConfig']!r}\n")
        f.write(f"OptimizationParams = {perf['OptimizationParams']!r}\n")
        f.write(f"ModelHiddenParams = {tiny['ModelHiddenParams']!r}\n")
    assert perf["RasterConfig"]["max_visible"] == 0  # auto-sizing path
    assert perf["OptimizationParams"]["multicam"] == 3

    train_cli.main([
        "-s", src, "--model_path", out, "--num_pts", "400",
        "--coarse_iterations", "4", "--iterations", "8",
        "--densification_interval", "4", "--densify_from_iter", "2",
        "--opacity_reset_interval", "1000",
        "--checkpoint_iterations", "8",
        "--bench_iters", "4",
        "--steps_per_dispatch", "2",
        "--rect_w", "4", "--rect_h", "4",
        "--chunk", "32", "--max_pairs_per_tile", "512",
        "--load_h", "64", "--load_w", "96",
        "--configs", merged,
    ])

    with open(os.path.join(out, "logger.json")) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    loss_lines = [l for l in lines if "Loss" in l]
    assert loss_lines and all(np.isfinite(l["Loss"]) for l in loss_lines)
    # the preset's knobs survived the merge into the cfg_args dump, and
    # the dump stays ast.literal_eval-parseable (the contract external
    # tools like scripts/eval_flow_epe.py rebuild the model from)
    import ast
    with open(os.path.join(out, "cfg_args")) as f:
        dumped = ast.literal_eval(f.read())
    assert dumped["cull_before_deform"] is True
    assert dumped["multicam"] == 3
    # r4 preset: reference LRs unscaled — per-camera densify stats are
    # the measured divergence fix (BASELINE.md r4), not LR scaling
    assert dumped["multicam_lr_scale"] == 1.0
    assert dumped["multicam_percam_stats"] == 1
    assert dumped["net_width"] == 16  # tiny_config hexplane override


def test_eval_only_smoke(tmp_path, monkeypatch):
    from waymo_fixture import make_fixture
    src = make_fixture(str(tmp_path / "clip"), n_frames=3)
    out = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import train as train_cli

    # the committed fixture weights make the end-to-end LPIPS path run in
    # CI (metric value is fixture-specific, not the calibrated LPIPS —
    # scripts/make_lpips_fixture.py)
    from s3gaussian_tpu.eval import lpips_jax
    monkeypatch.setenv("S3G_LPIPS_WEIGHTS", os.path.join(
        repo, "tests", "fixtures", "lpips_alex_fixture.npz"))
    lpips_jax._load_weights.cache_clear()
    from s3gaussian_tpu.eval import video as video_mod
    video_mod._jit_render.cache_clear()

    common = [
        "-s", src, "--model_path", out, "--num_pts", "300",
        "--stride", "2",
        "--max_visible", "2048", "--rect_w", "4", "--rect_h", "4",
        "--chunk", "32", "--max_pairs_per_tile", "512",
        "--load_h", "64", "--load_w", "96",
        "--configs", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "tiny_config.py"),
    ]
    # --eval_only with no trained checkpoint must refuse loudly, not
    # silently score the fresh init (the bug that produced garbage eval
    # numbers in the round-4 flow probes)
    with pytest.raises(SystemExit, match="no checkpoint"):
        train_cli.main(common + ["--eval_only"])
    # a minimal training run to produce the checkpoint the sweep restores
    train_cli.main(common + [
        "--coarse_iterations", "4", "--iterations", "8",
        "--densification_interval", "100", "--checkpoint_iterations", "8",
        "--bench_iters", "4", "--skip_final_eval",
    ])
    train_cli.main(common + ["--eval_only"])
    metrics_dir = os.path.join(out, "eval", "metrics")
    assert os.path.isdir(metrics_dir) and len(os.listdir(metrics_dir)) >= 2
    with open(os.path.join(metrics_dir, sorted(os.listdir(metrics_dir))[0])) as f:
        m = json.load(f)
    assert "psnr" in m and "ssim" in m
    # eval JSONs must record a real float LPIPS when weights are present
    # (VERDICT r2 missing #3)
    assert isinstance(m["lpips"], float) and np.isfinite(m["lpips"])
    assert os.path.exists(os.path.join(out, "cameras.json"))
    lpips_jax._load_weights.cache_clear()
    video_mod._jit_render.cache_clear()
