#!/usr/bin/env python
"""Convert torchvision VGG16 + LPIPS linear weights to the .npz consumed by
`gsplat_tpu/eval/lpips_jax.py`.

With network access (mirrors what the reference downloads at runtime,
`lpipsPyTorch/modules/utils.py:12-20`):

    python scripts/convert_lpips_weights.py --out lpips_vgg.npz

Offline, from checkpoints already on disk (any torchvision `vgg16` features
state_dict + R. Zhang's `vgg.pth` LPIPS linear heads):

    python scripts/convert_lpips_weights.py \
        --vgg_state vgg16-features.pth --lpips_state vgg.pth --out lpips_vgg.npz

then copy the .npz next to lpips_jax.py or point GSPLAT_LPIPS_WEIGHTS at it.
The conversion path itself is exercised end-to-end (synthetic checkpoints ->
converter -> metrics.py LPIPS numbers) by `tests/test_lpips.py`.
"""

from __future__ import annotations

import argparse

import numpy as np


def convert(vgg_features_state: dict, lpips_state: dict) -> dict:
    """torch state_dicts -> the flat npz dict lpips_jax loads.

    `vgg_features_state`: torchvision VGG16 `.features` state_dict (keys like
    `0.weight`, `2.bias`, ... — the 13 convs of the feature stack, in order).
    `lpips_state`: R. Zhang's LPIPS-vgg checkpoint (keys
    `lin{k}.model.1.weight`, k in 0..4)."""
    import torch

    out = {}
    conv_indices = sorted(
        {int(k.split(".")[0]) for k in vgg_features_state if k.endswith(".weight")}
    )
    for ci, li in enumerate(conv_indices):
        w = vgg_features_state[f"{li}.weight"]
        b = vgg_features_state[f"{li}.bias"]
        out[f"conv_{ci}_w"] = torch.as_tensor(w).detach().cpu().numpy()
        out[f"conv_{ci}_b"] = torch.as_tensor(b).detach().cpu().numpy()
    for k in range(5):
        w = lpips_state[f"lin{k}.model.1.weight"]
        out[f"lin_{k}_w"] = torch.as_tensor(w).flatten().detach().cpu().numpy()
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    ap.add_argument(
        "--vgg_state", default="",
        help="local torch checkpoint of torchvision vgg16 .features "
        "(skips the torchvision download)",
    )
    ap.add_argument(
        "--lpips_state", default="",
        help="local torch checkpoint of the LPIPS vgg linear heads "
        "(skips the GitHub download)",
    )
    args = ap.parse_args(argv)

    import torch

    if args.vgg_state:
        vgg_state = torch.load(args.vgg_state, map_location="cpu", weights_only=True)
    else:
        import torchvision

        vgg_state = torchvision.models.vgg16(
            weights="IMAGENET1K_V1"
        ).features.state_dict()

    if args.lpips_state:
        lpips_state = torch.load(args.lpips_state, map_location="cpu", weights_only=True)
    else:
        url = (
            "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
            "master/lpips/weights/v0.1/vgg.pth"
        )
        lpips_state = torch.hub.load_state_dict_from_url(
            url, progress=True, map_location="cpu"
        )

    out = convert(vgg_state, lpips_state)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
