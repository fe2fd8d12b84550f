"""DINO extractor mechanics: the stride-override patch must produce the
denser token grid WITH a stride-aware positional-embedding interpolation
(reference utils/feature_extractor.py:184-250).  The real dinov2 weights
need network access, so a mock ViT with the same interface (patch_embed
conv, cls token, pos_embed, interpolate_pos_encoding) stands in."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from preprocess.extract_dino import patch_vit_stride  # noqa: E402

PATCH = 14
DIM = 16
IMG = 42  # 3x3 grid at stride 14; 5x5 at stride 7


class MockViT(nn.Module):
    """Minimal dinov2-shaped model."""

    def __init__(self):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, DIM, kernel_size=PATCH,
                                          stride=PATCH)
        n = (IMG // PATCH) ** 2
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, DIM))
        self.cls_token = nn.Parameter(torch.zeros(1, 1, DIM))

    def interpolate_pos_encoding(self, x, w, h):
        # stock behavior: token count derived from patch_size — breaks
        # under a stride override (what patch_vit_stride must replace)
        assert x.shape[1] - 1 == (w // PATCH) * (h // PATCH), \
            "stock pos-embed interpolation used with a stride override"
        return self.pos_embed

    def forward_tokens(self, x):
        b, _, h, w = x.shape
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)  # [B,N,D]
        t = torch.cat([self.cls_token.expand(b, -1, -1), t], dim=1)
        return t + self.interpolate_pos_encoding(t, w, h)

    def get_intermediate_layers(self, x, n=1):
        return [self.forward_tokens(x)[:, 1:]]


def test_stride_equal_patch_is_identity():
    m = MockViT()
    m2, patch = patch_vit_stride(m, PATCH)
    assert patch == PATCH and m2.patch_embed.proj.stride == (PATCH, PATCH)
    out = m2.get_intermediate_layers(torch.randn(1, 3, IMG, IMG))[0]
    assert out.shape == (1, 9, DIM)


def test_stride_override_densifies_grid():
    m, patch = patch_vit_stride(MockViT(), 7)
    out = m.get_intermediate_layers(torch.randn(1, 3, IMG, IMG))[0]
    gh = 1 + (IMG - PATCH) // 7
    assert out.shape == (1, gh * gh, DIM)  # 5x5 = 25 tokens


def test_stride_override_without_patch_fails():
    """The stock interpolate_pos_encoding would compute the wrong token
    count under a stride override — the mock asserts on that, proving the
    replacement is load-bearing."""
    m = MockViT()
    m.patch_embed.proj.stride = (7, 7)  # override WITHOUT the pos-enc fix
    with pytest.raises(AssertionError,
                       match="stock pos-embed interpolation"):
        m.get_intermediate_layers(torch.randn(1, 3, IMG, IMG))


def test_pos_embed_values_interpolated_not_padded():
    torch.manual_seed(0)
    m, _ = patch_vit_stride(MockViT(), 7)
    x = torch.randn(1, 3, IMG, IMG)
    toks = m.patch_embed.proj(x).flatten(2).transpose(1, 2)
    toks = torch.cat([m.cls_token.expand(1, -1, -1), toks], dim=1)
    pos = m.interpolate_pos_encoding(toks, IMG, IMG)
    assert pos.shape == (1, 26, DIM)
    # corner patch pos-embeds should stay near the original corners
    orig = m.pos_embed[:, 1:].reshape(1, 3, 3, DIM)
    interp = pos[:, 1:].reshape(1, 5, 5, DIM)
    assert torch.allclose(interp[0, 0, 0], orig[0, 0, 0], atol=0.5)


def test_indivisible_stride_rejected():
    with pytest.raises(AssertionError, match="must divide"):
        patch_vit_stride(MockViT(), 5)
