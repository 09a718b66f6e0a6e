"""Loss functions vs a torch transcription of the reference formulas.

The reference SSIM (`utils/loss_utils.py:46-86`) is an 11x11 Gaussian-window
depthwise conv with 'same' padding on CHW tensors; here the oracle is written
with torch (CPU) following that exact recipe, independent of the jnp path.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gsplat_tpu.train import losses


def torch_ssim(img1_hwc, img2_hwc, window_size=11, sigma=1.5):
    def gaussian(ws, s):
        g = torch.tensor([math.exp(-((x - ws // 2) ** 2) / (2 * s**2)) for x in range(ws)])
        return g / g.sum()

    i1 = torch.from_numpy(np.moveaxis(img1_hwc, -1, 0)).unsqueeze(0).double()
    i2 = torch.from_numpy(np.moveaxis(img2_hwc, -1, 0)).unsqueeze(0).double()
    ch = i1.shape[1]
    w1d = gaussian(window_size, sigma).double()
    window = (w1d.unsqueeze(1) @ w1d.unsqueeze(0)).expand(ch, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(i1, window, padding=pad, groups=ch)
    mu2 = F.conv2d(i2, window, padding=pad, groups=ch)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(i1 * i1, window, padding=pad, groups=ch) - mu1_sq
    s2 = F.conv2d(i2 * i2, window, padding=pad, groups=ch) - mu2_sq
    s12 = F.conv2d(i1 * i2, window, padding=pad, groups=ch) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return float(m.mean())


def test_ssim_matches_reference_formula(rng):
    a = rng.random((37, 53, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal((37, 53, 3)).astype(np.float32), 0, 1)
    ours = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = torch_ssim(a, b)
    assert ours == pytest.approx(ref, abs=2e-5)


def test_ssim_identity(rng):
    a = rng.random((32, 32, 3)).astype(np.float32)
    assert float(losses.ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-5)


def test_l1_and_psnr(rng):
    a = rng.random((16, 16, 3)).astype(np.float32)
    b = rng.random((16, 16, 3)).astype(np.float32)
    assert float(losses.l1_loss(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
        np.abs(a - b).mean(), rel=1e-6
    )
    mse = ((a - b) ** 2).mean()
    assert float(losses.psnr(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(
        20 * np.log10(1.0 / np.sqrt(mse)), rel=1e-5
    )


def test_depth_l1_masks(rng):
    d = rng.random((8, 8)).astype(np.float32)
    gt = rng.random((8, 8)).astype(np.float32)
    mask = np.zeros((8, 8), np.float32)
    mask[:4] = 1.0
    got = float(losses.depth_l1_loss(jnp.asarray(d), jnp.asarray(gt), jnp.asarray(mask)))
    want = (np.abs(d - gt) * mask).mean()
    assert got == pytest.approx(want, rel=1e-6)


def test_ssim_custom_vjp_matches_autodiff(rng):
    """The hand-derived SSIM backward must equal autodiff of the plain
    formula (trusted on CPU; the custom VJP exists because the AD graph
    miscompiles on the TPU backend, not because the math differs)."""
    import jax
    from functools import partial

    a = rng.random((23, 31, 3)).astype(np.float32)
    b = np.clip(a + 0.2 * rng.standard_normal((23, 31, 3)).astype(np.float32), 0, 1)

    def plain_ssim(x, y):
        window = losses._gaussian_window(11, 1.5)
        blur = partial(losses._blur, window=window)
        return losses._ssim_map(*losses._ssim_fields(x, y, blur)).mean()

    gx_ref, gy_ref = jax.grad(plain_ssim, argnums=(0, 1))(jnp.asarray(a), jnp.asarray(b))
    gx, gy = jax.grad(losses.ssim, argnums=(0, 1))(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(gy_ref), rtol=1e-4, atol=1e-7)
