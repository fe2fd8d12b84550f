"""LPIPS in JAX (AlexNet / VGG16 backbones with linear calibration heads).

Parity: ``lpipsPyTorch/`` in the reference, which builds on torchvision
pretrained weights.  This environment has no torchvision and no network
egress, so weights must be provided as an .npz:

  * set ``S3G_LPIPS_WEIGHTS`` to a file produced by ``export_weights()``
    (run it once on any machine with torchvision + lpips available);
  * otherwise ``lpips()`` raises FileNotFoundError and callers record the
    metric as null (eval/metrics.py:lpips_or_none).

The architecture below mirrors lpipsPyTorch/modules/networks.py: feature
taps after each conv stage, unit-normalize along channels, squared
difference, 1x1 linear head, spatial mean, sum over stages.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet normalization used by LPIPS (networks.py BaseNet.set_requires_grad)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

ALEX_STAGES = (2, 5, 8, 10, 12)   # relu indices in torchvision alexnet.features
VGG_STAGES = (4, 9, 16, 23, 30)


def export_weights(path: str, net: str = "alex") -> None:  # pragma: no cover
    """Run on a machine with torch+torchvision+lpips to produce the npz."""
    import lpips as lpips_torch

    model = lpips_torch.LPIPS(net=net)
    arrs = {}
    feats = model.net
    for name, p in feats.named_parameters():
        arrs[f"net.{name}"] = p.detach().numpy()
    for i, lin in enumerate(model.lins):
        arrs[f"lin{i}.weight"] = lin.model[-1].weight.detach().numpy()
    np.savez(path, **arrs)


@functools.lru_cache(maxsize=2)
def _load_weights(net: str) -> Dict[str, np.ndarray]:
    path = os.environ.get("S3G_LPIPS_WEIGHTS", "")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "LPIPS weights unavailable: set S3G_LPIPS_WEIGHTS to an npz from "
            "eval/lpips_jax.py:export_weights()")
    return dict(np.load(path))


def _conv(x, w, b, stride=1, pad=0):
    # HIGHEST: on TPU the default is bf16 conv passes; the ±0.005 LPIPS
    # parity budget needs f32-accurate features (validated against the
    # torch forward in f32)
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return out + jnp.asarray(b).reshape(1, -1, 1, 1)


def _alex_features(x, wts) -> List[jnp.ndarray]:
    """torchvision alexnet.features with taps after each ReLU."""
    taps = []
    x = jax.nn.relu(_conv(x, wts["net.slice1.0.weight"], wts["net.slice1.0.bias"],
                          stride=4, pad=2))
    taps.append(x)
    x = -jax.lax.reduce_window(-x, jnp.inf, jax.lax.min, (1, 1, 3, 3),
                               (1, 1, 2, 2), "VALID")
    x = jax.nn.relu(_conv(x, wts["net.slice2.3.weight"], wts["net.slice2.3.bias"],
                          pad=2))
    taps.append(x)
    x = -jax.lax.reduce_window(-x, jnp.inf, jax.lax.min, (1, 1, 3, 3),
                               (1, 1, 2, 2), "VALID")
    x = jax.nn.relu(_conv(x, wts["net.slice3.6.weight"], wts["net.slice3.6.bias"],
                          pad=1))
    taps.append(x)
    x = jax.nn.relu(_conv(x, wts["net.slice4.8.weight"], wts["net.slice4.8.bias"],
                          pad=1))
    taps.append(x)
    x = jax.nn.relu(_conv(x, wts["net.slice5.10.weight"], wts["net.slice5.10.bias"],
                          pad=1))
    taps.append(x)
    return taps


def _vgg_features(x, wts) -> List[jnp.ndarray]:
    """torchvision vgg16.features with taps after relu1_2/2_2/3_3/4_3/5_3
    (lpipsPyTorch/modules/networks.py VGG slices)."""
    taps = []
    li = 0
    # (convs per block) with maxpool between blocks
    for block, n_convs in enumerate((2, 2, 3, 3, 3)):
        for c in range(n_convs):
            w = wts[f"net.slice{block + 1}.{li}.weight"]
            b = wts[f"net.slice{block + 1}.{li}.bias"]
            x = jax.nn.relu(_conv(x, w, b, pad=1))
            li += 2  # conv + relu
        taps.append(x)
        if block < 4:
            x = -jax.lax.reduce_window(-x, jnp.inf, jax.lax.min,
                                       (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
            li += 1  # maxpool
    return taps


def lpips_jnp(pred, gt, net: str = "alex"):
    """pred/gt: [H,W,3] in [0,1]. Pure jnp given the npz weights (they
    trace as constants), so the eval sweep can run it inside the render
    jit on the full-precision frame."""
    wts = _load_weights(net)
    x = jnp.asarray(pred, jnp.float32).transpose(2, 0, 1)[None] * 2 - 1
    y = jnp.asarray(gt, jnp.float32).transpose(2, 0, 1)[None] * 2 - 1
    shift = jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)
    scale = jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
    x = (x - shift) / scale
    y = (y - shift) / scale
    feats = _alex_features if net == "alex" else _vgg_features
    fx = feats(x, wts)
    fy = feats(y, wts)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        w = jnp.asarray(wts[f"lin{i}.weight"]).reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * w, axis=1))
    return total


def lpips(pred: np.ndarray, gt: np.ndarray, net: str = "alex") -> float:
    return float(lpips_jnp(pred, gt, net))
