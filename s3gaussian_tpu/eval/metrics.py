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
    """Mean filter with 'valid'-style usage (we crop afterwards). x [H,W]."""
    kernel = jnp.ones((win, win), x.dtype) / (win * win)
    return jax.scipy.signal.convolve2d(x, kernel, mode="same")


def ssim_skimage(pred: np.ndarray, gt: np.ndarray, win: int = 7,
                 data_range: float = 1.0) -> float:
    """structural_similarity with default settings (channel-averaged):
    uniform win×win window, unbiased covariance (cov_norm = N/(N-1)),
    mean over the valid (cropped) region."""
    pred = jnp.asarray(pred, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    if pred.ndim == 2:
        pred, gt = pred[..., None], gt[..., None]
    np_ = win * win
    cov_norm = np_ / (np_ - 1)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    pad = win // 2
    vals = []
    for c in range(pred.shape[-1]):
        x, y = pred[..., c], gt[..., c]
        ux = _uniform_filter(x, win)
        uy = _uniform_filter(y, win)
        uxx = _uniform_filter(x * x, win)
        uyy = _uniform_filter(y * y, win)
        uxy = _uniform_filter(x * y, win)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / \
            ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
        vals.append(s[pad:-pad, pad:-pad])
    return float(jnp.mean(jnp.stack(vals)))


def masked_ssim(pred, gt, mask, win: int = 7) -> float:
    """SSIM map averaged over masked pixels (video_utils.py:233-241 computes
    the full map with full=True and averages under the mask)."""
    pred = jnp.asarray(pred, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    np_ = win * win
    cov_norm = np_ / (np_ - 1)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    maps = []
    for c in range(pred.shape[-1]):
        x, y = pred[..., c], gt[..., c]
        ux = _uniform_filter(x, win)
        uy = _uniform_filter(y, win)
        vx = cov_norm * (_uniform_filter(x * x, win) - ux * ux)
        vy = cov_norm * (_uniform_filter(y * y, win) - uy * uy)
        vxy = cov_norm * (_uniform_filter(x * y, win) - ux * uy)
        s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / \
            ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
        maps.append(s)
    smap = jnp.mean(jnp.stack(maps, -1), -1)
    m = jnp.asarray(mask)
    return float(jnp.sum(jnp.where(m, smap, 0.0))
                 / jnp.maximum(jnp.sum(m), 1))


def lpips_or_none(pred: np.ndarray, gt: np.ndarray,
                  net: str = "alex") -> Optional[float]:
    """LPIPS if pretrained weights are available locally, else None."""
    try:
        from s3gaussian_tpu.eval.lpips_jax import lpips
        return float(lpips(pred, gt, net=net))
    except (ImportError, FileNotFoundError):
        return None
