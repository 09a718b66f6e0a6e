"""Image losses: L1, windowed SSIM, PSNR, depth-L1.

SSIM follows the reference exactly (`utils/loss_utils.py:46-86`): 11x11
Gaussian window, sigma 1.5, "same" padding, C1=0.01^2, C2=0.03^2 — written as
two separable depthwise convolutions that XLA fuses into a handful of VPU
loops (this *is* the fused-ssim equivalent; no custom kernel needed, the op is
bandwidth-bound and XLA's fusion already reaches it). Images are HWC float32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred, target):
    return jnp.abs(pred - target).mean()


def mse(pred, target):
    return ((pred - target) ** 2).mean()


def psnr(pred, target):
    """Per-image PSNR (`utils/image_utils.py:17-19`)."""
    m = jnp.mean((pred - target) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))


def _gaussian_window(window_size: int, sigma: float):
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2.0 * sigma**2))
    return jnp.asarray(g / g.sum(), jnp.float32)


def _blur(img, window):
    """Separable depthwise 'same'-padding blur over H and W of an HWC image."""
    k = window.shape[0]
    pad = k // 2
    # (H, W, C) -> conv along H then W. Use NCHW depthwise conv.
    x = jnp.moveaxis(img, -1, 0)[None]  # (1, C, H, W)
    c = x.shape[1]
    kernel_h = jnp.tile(window.reshape(1, 1, k, 1), (c, 1, 1, 1))
    kernel_w = jnp.tile(window.reshape(1, 1, 1, k), (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel_h.shape, ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, kernel_h, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn,
        feature_group_count=c,
    )
    x = jax.lax.conv_general_dilated(
        x, kernel_w, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn,
        feature_group_count=c,
    )
    return jnp.moveaxis(x[0], 0, -1)


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM over an HWC image pair, reference-faithful."""
    window = _gaussian_window(window_size, sigma)
    blur = partial(_blur, window=window)

    mu1 = blur(img1)
    mu2 = blur(img2)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu1_mu2

    C1 = 0.01**2
    C2 = 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return ssim_map.mean()


def photometric_loss(image, gt_image, lambda_dssim):
    """(1-λ)·L1 + λ·(1-SSIM) (`train.py:120-126`). Returns (loss, l1)."""
    ll1 = l1_loss(image, gt_image)
    loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(image, gt_image))
    return loss, ll1


def depth_l1_loss(invdepth, mono_invdepth, depth_mask):
    """mean(|render_invdepth - mono_invdepth| * mask) (`train.py:129-140`)."""
    return jnp.abs((invdepth - mono_invdepth) * depth_mask).mean()
