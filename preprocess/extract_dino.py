#!/usr/bin/env python
"""Offline DINOv2 feature extraction.

Parity: ``utils/feature_extractor.py`` — runs ``dinov2_vitb14`` (stride-7
patch extractor) over each clip image at 644×966 and saves per-image key
descriptors as .npy next to the clip (``dinov2_vitb14/{t:03d}_{cam}.npy``),
which the reader then PCA-reduces to 3 channels.  This is a host-side
torch tool exactly like the reference's (the TPU training path only
consumes the .npy files).

    python preprocess/extract_dino.py --clip <processed clip dir>
"""

from __future__ import annotations

import argparse
import os


def patch_vit_stride(model, stride: int):
    """Densify a ViT's patch grid by shrinking the patch-embed conv stride,
    with a stride-aware positional-embedding interpolation.

    Parity: ``ViTExtractor.patch_vit_resolution`` + ``_fix_pos_enc``
    (utils/feature_extractor.py:184-250) — the stock model interpolates
    its pos-embed for ``w // patch_size`` tokens, which is wrong once the
    stride differs from the patch size, so the method must be replaced
    with one that computes ``1 + (w - patch) // stride`` tokens.
    Returns (model, patch_size)."""
    import math
    import types

    import torch

    patch = model.patch_embed.proj.kernel_size[0]
    if stride == patch:
        return model, patch
    assert (patch % stride) == 0, \
        f"stride {stride} must divide patch size {patch}"
    model.patch_embed.proj.stride = (stride, stride)

    def interpolate_pos_encoding(self, x, w, h):
        npatch = x.shape[1] - 1
        pos = self.pos_embed
        n = pos.shape[1] - 1
        w0 = 1 + (w - patch) // stride
        h0 = 1 + (h - patch) // stride
        assert h0 * w0 == npatch, (
            f"grid {h0}x{w0} != {npatch} tokens (input {h}x{w}, "
            f"patch {patch}, stride {stride})")
        if npatch == n and w0 == h0:
            return pos
        class_emb, patch_pos = pos[:, 0], pos[:, 1:]
        dim = x.shape[-1]
        m = int(math.sqrt(n))
        interp = torch.nn.functional.interpolate(
            patch_pos.reshape(1, m, m, dim).permute(0, 3, 1, 2),
            size=(h0, w0), mode="bicubic", align_corners=False)
        interp = interp.permute(0, 2, 3, 1).view(1, -1, dim)
        return torch.cat((class_emb.unsqueeze(0), interp), dim=1)

    model.interpolate_pos_encoding = types.MethodType(
        interpolate_pos_encoding, model)
    return model, patch


def extract(clip_dir: str, img_shape=(644, 966), stride: int = 7,
            model_type: str = "dinov2_vitb14") -> None:
    import numpy as np
    import torch
    from PIL import Image

    out_dir = os.path.join(clip_dir, model_type)
    os.makedirs(out_dir, exist_ok=True)
    model = torch.hub.load("facebookresearch/dinov2", model_type)
    model.eval()
    model, patch = patch_vit_stride(model, stride)

    imgs = sorted(os.listdir(os.path.join(clip_dir, "images")))
    with torch.no_grad():
        for name in imgs:
            stem = os.path.splitext(name)[0]
            out_path = os.path.join(out_dir, stem + ".npy")
            if os.path.exists(out_path):
                continue
            img = Image.open(os.path.join(clip_dir, "images", name)).convert("RGB")
            img = img.resize((img_shape[1], img_shape[0]), Image.BILINEAR)
            x = torch.from_numpy(
                np.asarray(img, dtype=np.float32) / 255.0).permute(2, 0, 1)[None]
            mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
            std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
            x = (x - mean) / std
            feats = model.get_intermediate_layers(x, n=1)[0]  # [1, hw, C]
            gh = 1 + (img_shape[0] - patch) // stride
            gw = 1 + (img_shape[1] - patch) // stride
            feats = feats.reshape(1, gh, gw, -1)
            np.save(out_path, feats.numpy().astype(np.float16))
            print(f"saved {out_path} {tuple(feats.shape)}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--clip", required=True)
    parser.add_argument("--img_h", type=int, default=644)
    parser.add_argument("--img_w", type=int, default=966)
    parser.add_argument("--stride", type=int, default=7)
    parser.add_argument("--model", default="dinov2_vitb14")
    args = parser.parse_args(argv)
    extract(args.clip, (args.img_h, args.img_w), args.stride, args.model)


if __name__ == "__main__":
    main()
