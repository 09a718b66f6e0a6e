"""LPIPS-VGG numerics vs an independent numpy reference.

The production weights can't be downloaded here (no egress), so correctness
is pinned with a SMALL synthetic VGG-shaped weight set: a scaled-down
channel plan with the same structure (3x3 same-pad convs + ReLU per block,
2x2 max-pool between blocks, z-score input, unit-normalized taps, 1x1
linear heads, spatial mean, sum over taps). The numpy oracle below
re-implements the reference pipeline (`lpipsPyTorch/modules/{networks,
lpips,utils}.py`) from scratch — any transposed conv weight, wrong
normalization, or scaling mistake in `eval/lpips_jax.py` shows up as a
mismatch.
"""

import os

import numpy as np
import pytest

import gsplat_tpu.eval.lpips_jax as L

# small VGG-shaped plan (same block structure, fewer channels)
BLOCKS = [(8, 2), (12, 2), (16, 3), (24, 3), (24, 3)]


def make_weights(rng, path):
    convs_w, convs_b, lins = [], [], []
    cin = 3
    blob = {}
    i = 0
    for cout, n_convs in BLOCKS:
        for _ in range(n_convs):
            w = rng.normal(0, 0.25 / np.sqrt(cin * 9), (cout, cin, 3, 3)).astype(np.float32)
            b = rng.normal(0, 0.05, (cout,)).astype(np.float32)
            blob[f"conv_{i}_w"] = w
            blob[f"conv_{i}_b"] = b
            convs_w.append(w)
            convs_b.append(b)
            cin = cout
            i += 1
    for k, (cout, _) in enumerate(BLOCKS):
        lw = np.abs(rng.normal(0, 1.0, (cout,))).astype(np.float32)
        blob[f"lin_{k}_w"] = lw
        lins.append(lw)
    np.savez(path, **blob)
    return convs_w, convs_b, lins


def np_conv3x3(x, w, b):
    """x (C,H,W), w (O,I,3,3) same padding — direct numpy convolution."""
    c, h, wd = x.shape
    o = w.shape[0]
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1)))
    out = np.zeros((o, h, wd), np.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy : dy + h, dx : dx + wd]  # (I,H,W)
            out += np.einsum("oi,ihw->ohw", w[:, :, dy, dx], patch)
    return out + b[:, None, None]


def np_lpips(img1, img2, convs_w, convs_b, lins):
    shift = np.array([-0.030, -0.088, -0.188], np.float32)
    scale = np.array([0.458, 0.448, 0.450], np.float32)

    def feats(img):
        x = (img - shift) / scale
        x = np.moveaxis(x, -1, 0).astype(np.float32)  # (3,H,W)
        out = []
        ci = 0
        for cout, n_convs in BLOCKS:
            for _ in range(n_convs):
                x = np.maximum(np_conv3x3(x, convs_w[ci], convs_b[ci]), 0.0)
                ci += 1
            out.append(x)
            c, h, wd = x.shape
            x = x[:, : h // 2 * 2, : wd // 2 * 2]
            x = x.reshape(c, h // 2, 2, wd // 2, 2).max(axis=(2, 4))
        return out

    f1, f2 = feats(img1), feats(img2)
    total = 0.0
    for a, b, lw in zip(f1, f2, lins):
        na = a / (np.sqrt((a * a).sum(axis=0, keepdims=True)) + 1e-10)
        nb = b / (np.sqrt((b * b).sum(axis=0, keepdims=True)) + 1e-10)
        d = (na - nb) ** 2
        total += (d * lw[:, None, None]).sum(axis=0).mean()
    return total


@pytest.fixture()
def synthetic_weights(tmp_path, monkeypatch):
    rng = np.random.default_rng(0)
    path = str(tmp_path / "lpips_synth.npz")
    convs_w, convs_b, lins = make_weights(rng, path)
    monkeypatch.setenv("GSPLAT_LPIPS_WEIGHTS", path)
    L._load_weights.cache_clear()
    yield convs_w, convs_b, lins
    L._load_weights.cache_clear()


def test_lpips_matches_numpy_reference(synthetic_weights):
    convs_w, convs_b, lins = synthetic_weights
    rng = np.random.default_rng(7)
    img1 = rng.random((40, 48, 3)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 0.1, img1.shape), 0, 1).astype(np.float32)

    got = float(L.lpips(img1, img2))
    want = float(np_lpips(img1, img2, convs_w, convs_b, lins))
    assert want > 1e-5, "degenerate test case"
    np.testing.assert_allclose(got, want, rtol=2e-4)

    # identical images -> ~0
    same = float(L.lpips(img1, img1))
    assert abs(same) < 1e-7


def test_lpips_unavailable_reports(monkeypatch):
    monkeypatch.setenv("GSPLAT_LPIPS_WEIGHTS", "/nonexistent/file.npz")
    monkeypatch.setattr(L, "weights_path", lambda: None)
    assert not L.lpips_available()
    L._load_weights.cache_clear()
    with pytest.raises(FileNotFoundError):
        L._load_weights()
    L._load_weights.cache_clear()
