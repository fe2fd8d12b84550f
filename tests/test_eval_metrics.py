"""Eval metrics: closed-form and invariance checks."""

import numpy as np
import jax.numpy as jnp

from s3gaussian_tpu.eval.metrics import (lpips_or_none, masked_psnr,
                                         masked_ssim, psnr, ssim_skimage)
from s3gaussian_tpu.eval.visualization import (scene_flow_to_rgb, to8b,
                                               visualize_depth)
from s3gaussian_tpu.train.losses import psnr as train_psnr, ssim as train_ssim


def test_psnr_closed_form():
    a = jnp.zeros((16, 16, 3))
    b = jnp.full((16, 16, 3), 0.1)
    # mse = 0.01 -> psnr = 20 dB
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)
    np.testing.assert_allclose(float(train_psnr(a, b)), 20.0, atol=1e-4)


def test_ssim_identity_and_range():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3)).astype(np.float32)
    assert abs(ssim_skimage(img, img) - 1.0) < 1e-5
    other = rng.random((32, 32, 3)).astype(np.float32)
    s = ssim_skimage(img, other)
    assert -1.0 <= s < 0.9
    # training SSIM (gaussian window) likewise
    t = float(train_ssim(jnp.asarray(img).transpose(2, 0, 1),
                         jnp.asarray(img).transpose(2, 0, 1)))
    assert abs(t - 1.0) < 1e-5


def test_masked_metrics_use_only_masked_pixels():
    rng = np.random.default_rng(1)
    gt = rng.random((24, 24, 3)).astype(np.float32)
    pred = gt.copy()
    mask = np.zeros((24, 24), bool)
    mask[:8] = True          # ≥ half-window margin from the corruption,
    pred[12:] = 0.0          # since the SSIM map uses a 7×7 neighborhood
    assert float(masked_psnr(jnp.asarray(pred), jnp.asarray(gt),
                             jnp.asarray(mask))) > 60
    assert masked_ssim(pred, gt, mask) > 0.99


def test_lpips_gated_returns_none_without_weights(monkeypatch):
    monkeypatch.delenv("S3G_LPIPS_WEIGHTS", raising=False)
    rng = np.random.default_rng(2)
    a = rng.random((32, 32, 3)).astype(np.float32)
    assert lpips_or_none(a, a) is None


def test_visualizations_produce_valid_images():
    rng = np.random.default_rng(3)
    d = rng.uniform(0, 50, (16, 16)).astype(np.float32)
    d[0, 0] = 0.0
    img = visualize_depth(d)
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8
    flow = rng.normal(size=(16, 16, 3)).astype(np.float32)
    rgb = scene_flow_to_rgb(flow, flow_max_radius=2.0)
    assert rgb.shape == (16, 16, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    assert to8b(rgb).dtype == np.uint8


def test_save_videos_skips_dict_metric_entries(tmp_path):
    # regression: render_pixels returns dict-valued "metrics" and
    # "metrics_per_view" alongside the frame lists; save_videos must
    # only consume the list entries (it crashed slicing the per-view
    # dict, breaking every --eval_only sweep)
    from s3gaussian_tpu.eval.video import save_videos
    frames = {
        "rgbs": [np.zeros((8, 12, 3), np.float32)] * 6,
        "metrics": {"psnr": 30.0},
        "metrics_per_view": {"psnr": [30.0] * 6},
    }
    out = tmp_path / "vids"
    save_videos(frames, str(out), num_timestamps=2, num_cams=3)
    assert any(p.name.startswith("rgbs") for p in out.iterdir())
