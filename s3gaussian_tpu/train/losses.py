"""Training losses.

Parity: ``utils/loss_utils.py`` — l1/l2, the 11×11 σ=1.5 windowed SSIM
(:56-96), and the masked normalized depth loss (:21-45).  All jnp and
differentiable; the SSIM window convolution runs as a depthwise conv the
MXU handles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred, gt):
    return jnp.mean((pred - gt) ** 2)


def normalize_depth(d, max_depth=80.0):
    return jnp.clip(d / max_depth, 0.0, 1.0)


def depth_loss(pred, gt, loss_type: str = "l2", max_depth: float = 80.0):
    """Masked depth loss over valid lidar returns (loss_utils.py:24-45):
    valid = gt in (0.01, max_depth), both normalized by /max_depth.
    The reference takes the mean over valid pixels only."""
    valid = (gt > 0.01) & (gt < max_depth)
    p = normalize_depth(pred, max_depth)
    g = normalize_depth(gt, max_depth)
    if loss_type == "l1":
        err = jnp.abs(p - g)
    elif loss_type == "l2":
        err = (p - g) ** 2
    elif loss_type == "smooth_l1":
        d = jnp.abs(p - g)
        err = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    else:
        raise ValueError(loss_type)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, err, 0.0)) / n


@functools.lru_cache(maxsize=None)
def _ssim_gauss1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(x, window_size: int = 11):
    """Separable gaussian blur of [..., H, W] as shifted weighted adds.

    The 11x11 window is an outer product, so two 1D passes suffice; on TPU
    a grouped 3-channel conv leaves the MXU idle, while XLA fuses the 2x11
    shifted adds into two VPU passes (~2x faster forward, ~2x backward —
    the gradient of a shift is a shift).  Zero padding on both factors
    reproduces the 2D same-padding conv exactly."""
    g = _ssim_gauss1d(window_size)
    pad = window_size // 2
    h, w = x.shape[-2], x.shape[-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(pad, pad), (0, 0)])
    x = sum(float(g[k]) * jax.lax.dynamic_slice_in_dim(xp, k, h, x.ndim - 2)
            for k in range(window_size))
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, 0), (pad, pad)])
    return sum(float(g[k]) * jax.lax.dynamic_slice_in_dim(xp, k, w, x.ndim - 1)
               for k in range(window_size))


def ssim(img1, img2, window_size: int = 11):
    """img: [..., C, H, W]; returns scalar mean SSIM (loss_utils.py:67-96:
    depthwise gaussian window, same padding, C1=0.01², C2=0.03²)."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]

    def conv(x):
        return _blur(x, window_size)

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(img1 * img1) - mu1_sq
    s2 = conv(img2 * img2) - mu2_sq
    s12 = conv(img1 * img2) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / \
        ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(m)


def psnr(pred, gt):
    """utils/image_utils.py:17-19: 20·log10(1/√mse) per image, averaged."""
    mse = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))
