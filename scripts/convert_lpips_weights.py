#!/usr/bin/env python
"""Convert torchvision VGG16 + LPIPS linear weights to the .npz consumed by
`gsplat_tpu/eval/lpips_jax.py`.

Run on a machine WITH network access / the torch checkpoints:

    python scripts/convert_lpips_weights.py --out lpips_vgg.npz

then copy the .npz next to lpips_jax.py or point GSPLAT_LPIPS_WEIGHTS at it.
Mirrors what the reference downloads at runtime
(`lpipsPyTorch/modules/utils.py:12-20`).
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    import torch
    import torchvision

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    out = {}
    ci = 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            out[f"conv_{ci}_w"] = layer.weight.detach().numpy()
            out[f"conv_{ci}_b"] = layer.bias.detach().numpy()
            ci += 1

    url = (
        "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
        "master/lpips/weights/v0.1/vgg.pth"
    )
    state = torch.hub.load_state_dict_from_url(url, progress=True, map_location="cpu")
    for k in range(5):
        out[f"lin_{k}_w"] = state[f"lin{k}.model.1.weight"].flatten().numpy()

    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays")


if __name__ == "__main__":
    main()
