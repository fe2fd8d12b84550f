"""Evaluation metrics.

Parity targets:
  * PSNR — utils/image_utils.py:17-19 (20·log10(1/√mse));
  * skimage-style SSIM (uniform 7×7 window, the estimator skimage uses with
    default settings) — utils/video_utils.py:213-220 calls
    ``skimage.metrics.structural_similarity(..., data_range=1.0,
    channel_axis=-1)``; skimage is not in this image so the estimator is
    reimplemented (uniform filter, sample covariance with N/(N-1)
    correction, edge crop of win//2);
  * masked (dynamic-region) PSNR/SSIM — utils/video_utils.py:223-241;
  * LPIPS — lpipsPyTorch/ uses torchvision pretrained nets; with no
    pretrained weights available in this environment, LPIPS runs only when
    a weights file is provided (see ``lpips_jax.py``), otherwise reports
    None (recorded as such in eval JSONs).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def masked_psnr(pred: jnp.ndarray, gt: jnp.ndarray,
                mask: jnp.ndarray) -> jnp.ndarray:
    """PSNR over masked pixels (video_utils.py:223-231). pred/gt [H,W,3],
    mask [H,W] bool."""
    m = mask[..., None]
    n = jnp.maximum(jnp.sum(m) * 3, 1)
    mse = jnp.sum(jnp.where(m, (pred - gt) ** 2, 0.0)) / n
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def _uniform_filter(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Mean filter with 'valid'-style usage (we crop afterwards). x [H,W].

    HIGHEST precision is load-bearing: on TPU the conv otherwise runs in
    bf16 passes, and SSIM's variance terms (uxx − ux²) are catastrophic
    cancellations of ~1.0-magnitude filtered moments — bf16 rounding
    (~4e-3) swamps real variances and produced SSIM values NOISY BY
    ±0.01 and occasionally > 1.0 on near-identical image pairs."""
    kernel = jnp.ones((win, win), x.dtype) / (win * win)
    return jax.scipy.signal.convolve2d(x, kernel, mode="same",
                                       precision=jax.lax.Precision.HIGHEST)


def _ssim_channel_map(x: jnp.ndarray, y: jnp.ndarray, win: int,
                      data_range: float) -> jnp.ndarray:
    np_ = win * win
    cov_norm = np_ / (np_ - 1)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ux = _uniform_filter(x, win)
    uy = _uniform_filter(y, win)
    vx = cov_norm * (_uniform_filter(x * x, win) - ux * ux)
    vy = cov_norm * (_uniform_filter(y * y, win) - uy * uy)
    vxy = cov_norm * (_uniform_filter(x * y, win) - ux * uy)
    return ((2 * ux * uy + c1) * (2 * vxy + c2)) / \
        ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))


def ssim_skimage_jnp(pred: jnp.ndarray, gt: jnp.ndarray, win: int = 7,
                     data_range: float = 1.0) -> jnp.ndarray:
    """structural_similarity with default settings (channel-averaged):
    uniform win×win window, unbiased covariance (cov_norm = N/(N-1)),
    mean over the valid (cropped) region.  Pure jnp — jit-safe, so the
    eval sweep can compute it on device from the full-precision render."""
    pred = jnp.asarray(pred, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    if pred.ndim == 2:
        pred, gt = pred[..., None], gt[..., None]
    pad = win // 2
    vals = [_ssim_channel_map(pred[..., c], gt[..., c], win,
                              data_range)[pad:-pad, pad:-pad]
            for c in range(pred.shape[-1])]
    return jnp.mean(jnp.stack(vals))


def ssim_skimage(pred: np.ndarray, gt: np.ndarray, win: int = 7,
                 data_range: float = 1.0) -> float:
    return float(ssim_skimage_jnp(pred, gt, win, data_range))


def masked_ssim_jnp(pred, gt, mask, win: int = 7) -> jnp.ndarray:
    """SSIM map averaged over masked pixels (video_utils.py:233-241 computes
    the full map with full=True and averages under the mask). Pure jnp."""
    pred = jnp.asarray(pred, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    maps = [_ssim_channel_map(pred[..., c], gt[..., c], win, 1.0)
            for c in range(pred.shape[-1])]
    smap = jnp.mean(jnp.stack(maps, -1), -1)
    m = jnp.asarray(mask)
    return (jnp.sum(jnp.where(m, smap, 0.0))
            / jnp.maximum(jnp.sum(m), 1))


def masked_ssim(pred, gt, mask, win: int = 7) -> float:
    return float(masked_ssim_jnp(pred, gt, mask, win))


def lpips_or_none(pred: np.ndarray, gt: np.ndarray,
                  net: str = "alex") -> Optional[float]:
    """LPIPS if pretrained weights are available locally, else None."""
    try:
        from s3gaussian_tpu.eval.lpips_jax import lpips
        return float(lpips(pred, gt, net=net))
    except (ImportError, FileNotFoundError):
        return None
