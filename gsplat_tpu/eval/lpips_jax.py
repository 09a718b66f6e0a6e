"""LPIPS perceptual metric in JAX (VGG16 backbone).

Re-implementation of the reference's `lpipsPyTorch/` module (VGG16 feature
stack, unit-normalized channel activations, learned linear weights, spatial
average — `lpipsPyTorch/modules/lpips.py`). The reference downloads both the
torchvision VGG16 weights and R. Zhang's LPIPS linear weights from the
network (`lpipsPyTorch/modules/utils.py:12-20`); this environment has no
egress, so weights must be provided on disk:

    GSPLAT_LPIPS_WEIGHTS=/path/to/lpips_vgg.npz

The .npz must hold `conv_<i>_w`/`conv_<i>_b` (VGG16 features, OIHW) and
`lin_<k>_w` (1x1 LPIPS heads, (C,)), convertible from the torch checkpoints
with `scripts/convert_lpips_weights.py`. When the file is absent,
`lpips_available()` is False and metrics report lpips as null.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

# VGG16 feature-extractor conv layout: (out_channels, n_convs) per block;
# LPIPS taps the activations after each block's last ReLU (pre-pool).
VGG16_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def weights_path() -> str | None:
    p = os.environ.get("GSPLAT_LPIPS_WEIGHTS", "")
    if p and os.path.exists(p):
        return p
    default = os.path.join(os.path.dirname(__file__), "lpips_vgg.npz")
    return default if os.path.exists(default) else None


def lpips_available() -> bool:
    return weights_path() is not None


@lru_cache(maxsize=1)
def _load_weights():
    path = weights_path()
    if path is None:
        raise FileNotFoundError(
            "LPIPS weights not found — set GSPLAT_LPIPS_WEIGHTS (see module docstring)"
        )
    blob = np.load(path)
    convs = []
    i = 0
    while f"conv_{i}_w" in blob:
        convs.append((jnp.asarray(blob[f"conv_{i}_w"]), jnp.asarray(blob[f"conv_{i}_b"])))
        i += 1
    lins = []
    k = 0
    while f"lin_{k}_w" in blob:
        lins.append(jnp.asarray(blob[f"lin_{k}_w"]))
        k += 1
    return convs, lins


def _vgg_features(x, convs):
    """x: (1, 3, H, W) normalized. Returns the 5 block activations."""
    feats = []
    ci = 0
    for _, n_convs in VGG16_BLOCKS:
        for _ in range(n_convs):
            w, b = convs[ci]
            ci += 1
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + b[None, :, None, None]
            x = jax.nn.relu(x)
        feats.append(x)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        )
    return feats


def lpips(img1, img2):
    """LPIPS(vgg) for a pair of (H, W, 3) images in [0, 1].

    Matches the reference pipeline exactly (`lpipsPyTorch/modules/`):
    the [0, 1] image is z-scored directly (`networks.py:50-51` — the
    vendored variant does NOT rescale to [-1, 1] first), activations are
    normalized as x / (||x||_c + 1e-10) (`utils.py:6-8`), squared diffs go
    through the 1x1 linear heads and a spatial mean, summed over the 5 taps
    (`lpips.py:31-36`).
    """
    convs, lins = _load_weights()

    def prep(img):
        x = (img - _SHIFT) / _SCALE
        return jnp.moveaxis(x, -1, 0)[None]  # (1,3,H,W)

    f1 = _vgg_features(prep(img1), convs)
    f2 = _vgg_features(prep(img2), convs)
    total = 0.0
    for a, b, w in zip(f1, f2, lins):
        na = a / (jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True)) + 1e-10)
        nb = b / (jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True)) + 1e-10)
        d = (na - nb) ** 2  # (1,C,H,W)
        total = total + jnp.mean(jnp.sum(d * w[None, :, None, None], axis=1))
    return total
