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
    """Separable depthwise 'same'-padding blur over H and W of an HWC image.

    precision=HIGHEST is load-bearing: XLA:TPU convolutions default to bf16
    multiplies, and SSIM's variance terms blur(x^2) - mu^2 cancel almost
    exactly — at bf16 the residue is garbage, the (sigma^2 + C2) denominators
    go near-zero/negative, and the AD gradient comes out ~1e9x too large
    (measured: grad norm 2.8e9 on TPU vs 9.7e-3 on CPU for the same inputs,
    cosine similarity 0.0). That noise, fed to Adam, silently stalls the
    whole training loop while every CPU test stays green."""
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
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kernel_w, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.moveaxis(x[0], 0, -1)


_C1 = 0.01**2
_C2 = 0.03**2


def _ssim_fields(img1, img2, blur):
    mu1 = blur(img1)
    mu2 = blur(img2)
    sigma1_sq = blur(img1 * img1) - mu1 * mu1
    sigma2_sq = blur(img2 * img2) - mu2 * mu2
    sigma12 = blur(img1 * img2) - mu1 * mu2
    return mu1, mu2, sigma1_sq, sigma2_sq, sigma12


def _ssim_map(mu1, mu2, sigma1_sq, sigma2_sq, sigma12):
    return ((2 * mu1 * mu2 + _C1) * (2 * sigma12 + _C2)) / (
        (mu1 * mu1 + mu2 * mu2 + _C1) * (sigma1_sq + sigma2_sq + _C2)
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM over an HWC image pair, reference-faithful.

    Hand-derived custom VJP (the fused-ssim analogue,
    `utils/loss_utils.py:24-38`). The explicit backward is not just a perf
    choice: on this TPU backend, XLA miscompiles the AD-generated gradient
    graph of blur(x)*...|/den fusions (grad norm 1.4e3 vs 9.7e-3 on CPU,
    cosine ~0, while the forward and every hand-bisected sub-path match CPU
    exactly). Building the backward explicitly from forward-style blurs +
    elementwise ops produces a graph shape that compiles correctly.
    """
    window = _gaussian_window(window_size, sigma)
    blur = partial(_blur, window=window)
    return _ssim_map(*_ssim_fields(img1, img2, blur)).mean()


def _ssim_fwd(img1, img2, window_size, sigma):
    window = _gaussian_window(window_size, sigma)
    blur = partial(_blur, window=window)
    fields = _ssim_fields(img1, img2, blur)
    return _ssim_map(*fields).mean(), (img1, img2, fields)


def _ssim_partials(mu1, mu2, s1, s2, s12):
    """Per-pixel partials of ssim_map wrt (mu1, blur(x^2), blur(x*y)).

    With A=2 mu1 mu2+C1, B=2 s12+C2, C=mu1^2+mu2^2+C1, D=s1+s2+C2 and
    s1=blur(x^2)-mu1^2, s12=blur(xy)-mu1 mu2 (mirrors the reference CUDA
    derivation in fused-ssim; `backward` of `FusedSSIMMap`):
      d/d blur(xy) = 2A/(CD)
      d/d blur(x^2) = -AB/(C D^2)
      d/d mu1 = 2 mu2 B/(CD) - 2 mu1 AB/(C^2 D) + 2 mu1 AB/(C D^2) - 2 mu2 A/(CD)
    """
    A = 2 * mu1 * mu2 + _C1
    B = 2 * s12 + _C2
    C = mu1 * mu1 + mu2 * mu2 + _C1
    D = s1 + s2 + _C2
    inv_CD = 1.0 / (C * D)
    AB_CD = A * B * inv_CD
    d_q = 2 * A * inv_CD
    d_p = -AB_CD / D
    d_mu1 = (2 * mu2 * B) * inv_CD - 2 * mu1 * AB_CD / C + 2 * mu1 * AB_CD / D - mu2 * d_q
    return d_mu1, d_p, d_q


def _ssim_bwd(window_size, sigma, res, g):
    img1, img2, (mu1, mu2, s1, s2, s12) = res
    window = _gaussian_window(window_size, sigma)
    blur = partial(_blur, window=window)
    scale = g / img1.size
    # x-side: map depends on x through mu1=blur(x), p=blur(x^2), q=blur(xy).
    # blur^T == blur (symmetric window, zero-pad 'same').
    d_mu1, d_p, d_q = _ssim_partials(mu1, mu2, s1, s2, s12)
    gx = scale * (blur(d_mu1) + 2 * img1 * blur(d_p) + img2 * blur(d_q))
    # y-side by symmetry of ssim_map in (x, y)
    d_mu2, d_p2, d_q2 = _ssim_partials(mu2, mu1, s2, s1, s12)
    gy = scale * (blur(d_mu2) + 2 * img2 * blur(d_p2) + img1 * blur(d_q2))
    return gx, gy


ssim.defvjp(_ssim_fwd, _ssim_bwd)


def photometric_loss(image, gt_image, lambda_dssim):
    """(1-λ)·L1 + λ·(1-SSIM) (`train.py:120-126`). Returns (loss, l1)."""
    ll1 = l1_loss(image, gt_image)
    loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(image, gt_image))
    return loss, ll1


def depth_l1_loss(invdepth, mono_invdepth, depth_mask):
    """mean(|render_invdepth - mono_invdepth| * mask) (`train.py:129-140`)."""
    return jnp.abs((invdepth - mono_invdepth) * depth_mask).mean()
