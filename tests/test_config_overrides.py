"""Config-file RasterConfig overrides + the max_visible auto-sizer
(train.py::auto_max_visible) — the right-sizing rule the cull_before_deform
A/B established (BASELINE.md: right-sized 1.49x, oversized -4.5%)."""

import os
import sys

import numpy as np

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)


def test_raster_config_file_override(tmp_path):
    from s3gaussian_tpu.config import (ModelHiddenParams, ModelParams,
                                       OptimizationParams, PipelineParams,
                                       RasterConfig, apply_config_file)
    p = tmp_path / "preset.py"
    p.write_text("RasterConfig = dict(cull_before_deform=True, "
                 "max_visible=0, chunk=64)\n"
                 "OptimizationParams = dict(batch_size=2)\n")
    model, pipe, opt, hyper = (ModelParams(), PipelineParams(),
                               OptimizationParams(), ModelHiddenParams())
    cfg = RasterConfig()
    apply_config_file(str(p), model, pipe, opt, hyper, cfg)
    assert cfg.cull_before_deform is True
    assert cfg.max_visible == 0
    assert cfg.chunk == 64
    assert opt.batch_size == 2
    # omitted groups keep their defaults
    assert cfg.rect_w == RasterConfig().rect_w


def test_waymo_perf_preset_parses():
    from s3gaussian_tpu.config import RasterConfig, load_config_overrides
    ov = load_config_overrides(os.path.join(repo, "arguments",
                                            "waymo_perf.py"))
    rc = ov["RasterConfig"]
    assert rc["cull_before_deform"] and rc["max_visible"] == 0
    assert all(hasattr(RasterConfig(), k) for k in rc)


def _look_at_cam(fovx=1.0, fovy=0.8):
    from s3gaussian_tpu.data.cameras import make_camera
    # identity pose: camera at origin looking down +z (row-vector W2C^T)
    return make_camera(np.eye(3), np.zeros(3), fovx, fovy,
                       np.zeros((4, 4, 3), np.float32), 0.0)


def test_auto_max_visible_counts_frustum():
    from train import auto_max_visible
    cam = _look_at_cam()
    rng = np.random.default_rng(0)
    # 3000 points squarely inside the frustum, 3000 behind the camera
    z = rng.uniform(5.0, 40.0, 3000)
    front = np.stack([0.3 * np.tan(0.5) * z * rng.uniform(-1, 1, 3000),
                      0.3 * np.tan(0.4) * z * rng.uniform(-1, 1, 3000), z], 1)
    back = front * np.asarray([1.0, 1.0, -1.0])
    pts = np.concatenate([front, back]).astype(np.float32)
    nr = auto_max_visible(pts, [cam], capacity=1 << 20, lane=2048)
    # 2x the 3000 visible, lane-rounded up
    assert nr == int(np.ceil(2.0 * 3000 / 2048)) * 2048
    # clamped to pool capacity
    assert auto_max_visible(pts, [cam], capacity=4096, lane=2048) == 4096
    # no visible points -> still at least one lane
    assert auto_max_visible(back.astype(np.float32), [cam],
                            capacity=1 << 20, lane=2048) == 2048


def test_auto_max_visible_takes_worst_camera():
    from train import auto_max_visible
    import dataclasses
    import jax.numpy as jnp
    cam = _look_at_cam()
    # a second camera looking down -z sees the 'back' half instead
    flip = np.diag([1.0, -1.0, -1.0])
    from s3gaussian_tpu.data.cameras import make_camera
    cam2 = make_camera(flip, np.zeros(3), 1.0, 0.8,
                       np.zeros((4, 4, 3), np.float32), 0.0)
    rng = np.random.default_rng(1)
    z = rng.uniform(5.0, 40.0, 1000)
    front = np.stack([np.zeros(1000), np.zeros(1000), z], 1)
    back = np.stack([np.zeros(200), np.zeros(200), -z[:200]], 1)
    pts = np.concatenate([front, back]).astype(np.float32)
    n1 = auto_max_visible(pts, [cam], capacity=1 << 20, lane=64)
    nboth = auto_max_visible(pts, [cam, cam2], capacity=1 << 20, lane=64)
    assert nboth == n1  # worst camera (1000 visible) dominates
