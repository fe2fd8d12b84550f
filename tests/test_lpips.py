"""LPIPS graph validation.

No torchvision/pretrained weights exist in this environment, so the JAX
graph (eval/lpips_jax.py) is checked against an independent pure-torch
forward of the same torchvision layer topology (alexnet.features /
vgg16.features as documented, + LPIPS normalization and linear heads,
lpipsPyTorch/modules/*.py in the reference) using shared RANDOM weights.
This pins the architecture — strides, paddings, pool placement, unit
normalization, head wiring — so that with real exported weights the
metric matches the reference within float error.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from s3gaussian_tpu.eval import lpips_jax  # noqa: E402

ALEX_CFG = [  # (out_ch, kernel, stride, pad) per conv; taps after each relu
    (8, 11, 4, 2), (16, 5, 1, 2), (24, 3, 1, 1), (16, 3, 1, 1), (16, 3, 1, 1)]
VGG_BLOCKS = [(2, 8), (2, 16), (3, 24), (3, 24), (3, 24)]  # (n_convs, out_ch)


def rand_alex_npz(rng):
    wts = {}
    in_ch = 3
    # lpips-package naming: net.slice{k}.{torchvision layer idx}.weight
    idxs = [(1, 0), (2, 3), (3, 6), (4, 8), (5, 10)]
    for (sl, li), (out, k, s, p) in zip(idxs, ALEX_CFG):
        wts[f"net.slice{sl}.{li}.weight"] = rng.normal(
            0, 0.1, (out, in_ch, k, k)).astype(np.float32)
        wts[f"net.slice{sl}.{li}.bias"] = rng.normal(
            0, 0.1, (out,)).astype(np.float32)
        in_ch = out
        wts[f"lin{sl - 1}.weight"] = np.abs(rng.normal(
            0, 0.1, (1, out, 1, 1))).astype(np.float32)
    return wts


def rand_vgg_npz(rng):
    """Weight naming follows the running torchvision layer index that
    lpips_jax._vgg_features reconstructs (conv+relu = 2, maxpool = 1)."""
    wts = {}
    in_ch = 3
    li = 0
    for block, (n_convs, out) in enumerate(VGG_BLOCKS):
        for c in range(n_convs):
            wts[f"net.slice{block + 1}.{li}.weight"] = rng.normal(
                0, 0.05, (out, in_ch, 3, 3)).astype(np.float32)
            wts[f"net.slice{block + 1}.{li}.bias"] = rng.normal(
                0, 0.05, (out,)).astype(np.float32)
            in_ch = out
            li += 2
        wts[f"lin{block}.weight"] = np.abs(rng.normal(
            0, 0.1, (1, out, 1, 1))).astype(np.float32)
        if block < 4:
            li += 1
    return wts


def torch_lpips(pred, gt, wts, net):
    """Independent torch forward of the LPIPS pipeline."""
    def prep(img):
        x = torch.from_numpy(img.transpose(2, 0, 1)[None]).float() * 2 - 1
        shift = torch.tensor(lpips_jax._SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(lpips_jax._SCALE).view(1, 3, 1, 1)
        return (x - shift) / scale

    def alex_feats(x):
        taps = []
        idxs = [(1, 0), (2, 3), (3, 6), (4, 8), (5, 10)]
        for i, ((sl, li), (out, k, s, p)) in enumerate(zip(idxs, ALEX_CFG)):
            if i in (1, 2):  # maxpool before convs 2 and 3 (alexnet.features)
                x = F.max_pool2d(x, 3, 2)
            w = torch.from_numpy(wts[f"net.slice{sl}.{li}.weight"])
            b = torch.from_numpy(wts[f"net.slice{sl}.{li}.bias"])
            x = F.relu(F.conv2d(x, w, b, stride=s, padding=p))
            taps.append(x)
        return taps

    def vgg_feats(x):
        taps = []
        li = 0
        for block, (n_convs, out) in enumerate(VGG_BLOCKS):
            for c in range(n_convs):
                w = torch.from_numpy(wts[f"net.slice{block + 1}.{li}.weight"])
                b = torch.from_numpy(wts[f"net.slice{block + 1}.{li}.bias"])
                x = F.relu(F.conv2d(x, w, b, padding=1))
                li += 2
            taps.append(x)
            if block < 4:
                x = F.max_pool2d(x, 2, 2)
                li += 1
        return taps

    feats = alex_feats if net == "alex" else vgg_feats
    fx, fy = feats(prep(pred)), feats(prep(gt))
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        d = (a - b) ** 2
        w = torch.from_numpy(wts[f"lin{i}.weight"])
        total = total + (d * w).sum(1).mean()
    return float(total)


@pytest.mark.parametrize("net,maker", [("alex", rand_alex_npz),
                                       ("vgg", rand_vgg_npz)])
def test_lpips_graph_matches_torch(tmp_path, monkeypatch, net, maker):
    rng = np.random.default_rng(0)
    wts = maker(rng)
    npz = tmp_path / f"lpips_{net}.npz"
    np.savez(npz, **wts)
    monkeypatch.setenv("S3G_LPIPS_WEIGHTS", str(npz))
    lpips_jax._load_weights.cache_clear()

    for seed in (1, 2):
        r = np.random.default_rng(seed)
        pred = r.random((64, 64, 3)).astype(np.float32)
        gt = np.clip(pred + 0.1 * r.random((64, 64, 3)).astype(np.float32),
                     0, 1)
        want = torch_lpips(pred, gt, wts, net)
        got = lpips_jax.lpips(pred, gt, net=net)
        assert want > 0
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    lpips_jax._load_weights.cache_clear()


def test_lpips_identical_images_zero(tmp_path, monkeypatch):
    rng = np.random.default_rng(3)
    npz = tmp_path / "lpips_alex.npz"
    np.savez(npz, **rand_alex_npz(rng))
    monkeypatch.setenv("S3G_LPIPS_WEIGHTS", str(npz))
    lpips_jax._load_weights.cache_clear()
    img = np.random.default_rng(4).random((64, 64, 3)).astype(np.float32)
    assert abs(lpips_jax.lpips(img, img, net="alex")) < 1e-6
    lpips_jax._load_weights.cache_clear()


def test_lpips_fixture_golden_value(monkeypatch):
    """Pins the committed fixture weights (scripts/make_lpips_fixture.py):
    a silent edit/corruption of the npz, or a graph regression, moves this
    golden number."""
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fix = os.path.join(repo, "tests", "fixtures", "lpips_alex_fixture.npz")
    monkeypatch.setenv("S3G_LPIPS_WEIGHTS", fix)
    lpips_jax._load_weights.cache_clear()
    r = np.random.default_rng(7)
    pred = r.random((64, 64, 3)).astype(np.float32)
    gt = np.clip(pred + 0.1 * r.random((64, 64, 3)).astype(np.float32), 0, 1)
    got = lpips_jax.lpips(pred, gt)
    np.testing.assert_allclose(got, 0.0127999, rtol=1e-3)
    lpips_jax._load_weights.cache_clear()


def test_lpips_none_without_weights(monkeypatch):
    from s3gaussian_tpu.eval.metrics import lpips_or_none
    monkeypatch.delenv("S3G_LPIPS_WEIGHTS", raising=False)
    lpips_jax._load_weights.cache_clear()
    img = np.zeros((16, 16, 3), np.float32)
    assert lpips_or_none(img, img) is None
