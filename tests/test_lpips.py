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


# torchvision VGG16 `.features` conv layer indices (the Sequential slots the
# 13 convs occupy; pools/ReLUs fill the gaps) — the key layout the offline
# converter must understand
_VGG16_FEATURE_CONV_SLOTS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def test_convert_weights_end_to_end_through_metrics(tmp_path, monkeypatch):
    """Prove the offline conversion path: synthetic torch checkpoints in the
    real torchvision/LPIPS key layouts -> scripts/convert_lpips_weights.py ->
    GSPLAT_LPIPS_WEIGHTS -> metrics.py producing real LPIPS floats.

    (The true weights need network access this environment doesn't have —
    `lpipsPyTorch/modules/utils.py:12-20` downloads them at runtime in the
    reference — so the conversion machinery is what's validated here.)"""
    import json
    import sys

    import torch
    from PIL import Image

    sys.path.insert(0, "/root/repo")
    from scripts import convert_lpips_weights as conv_cli
    import metrics as metrics_cli

    rng = np.random.default_rng(3)

    # synthetic checkpoints: small channels, REAL key layouts
    vgg_state = {}
    cin = 3
    couts = [c for c, n in BLOCKS for _ in range(n)]
    for slot, cout in zip(_VGG16_FEATURE_CONV_SLOTS, couts):
        vgg_state[f"{slot}.weight"] = torch.tensor(
            rng.normal(0, 0.25 / np.sqrt(cin * 9), (cout, cin, 3, 3)).astype(np.float32)
        )
        vgg_state[f"{slot}.bias"] = torch.tensor(
            rng.normal(0, 0.05, (cout,)).astype(np.float32)
        )
        cin = cout
    lpips_state = {
        f"lin{k}.model.1.weight": torch.tensor(
            np.abs(rng.normal(0, 1.0, (1, c, 1, 1))).astype(np.float32)
        )
        for k, (c, _) in enumerate(BLOCKS)
    }
    vgg_path = str(tmp_path / "vgg16_features.pth")
    lp_path = str(tmp_path / "lpips_vgg_heads.pth")
    torch.save(vgg_state, vgg_path)
    torch.save(lpips_state, lp_path)

    npz_path = str(tmp_path / "lpips_vgg.npz")
    rc = conv_cli.main(
        ["--vgg_state", vgg_path, "--lpips_state", lp_path, "--out", npz_path]
    )
    assert rc == 0
    blob = np.load(npz_path)
    # conv order must follow the Sequential slot order, not string order
    np.testing.assert_array_equal(
        blob["conv_2_w"], vgg_state["5.weight"].numpy()
    )
    assert blob["lin_4_w"].shape == (BLOCKS[4][0],)

    # a tiny model dir with render/gt pairs -> metrics.py end to end
    mdir = tmp_path / "model" / "test" / "ours_1"
    for sub in ("renders", "gt"):
        (mdir / sub).mkdir(parents=True)
    for i in range(2):
        a = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        b = np.clip(a + rng.normal(0, 12, a.shape), 0, 255).astype(np.uint8)
        Image.fromarray(a).save(mdir / "renders" / f"{i:05d}.png")
        Image.fromarray(b).save(mdir / "gt" / f"{i:05d}.png")

    monkeypatch.setenv("GSPLAT_LPIPS_WEIGHTS", npz_path)
    L._load_weights.cache_clear()
    try:
        rc = metrics_cli.main(["-m", str(tmp_path / "model")])
        assert rc == 0
        with open(tmp_path / "model" / "results.json") as f:
            results = json.load(f)
        r = results["ours_1"]
        assert isinstance(r["LPIPS"], float) and np.isfinite(r["LPIPS"])
        assert r["LPIPS"] > 0.0
        with open(tmp_path / "model" / "per_view.json") as f:
            pv = json.load(f)
        assert all(
            isinstance(v, float) for v in pv["ours_1"]["LPIPS"].values()
        )
    finally:
        L._load_weights.cache_clear()


def test_metrics_reports_unavailable_marker(tmp_path, monkeypatch):
    """Without weights, metrics.py must keep LPIPS numeric-or-null (so
    numeric consumers don't break on a string) and publish the
    machine-readable status in a separate LPIPS_status field."""
    import json
    import sys

    from PIL import Image

    sys.path.insert(0, "/root/repo")
    import metrics as metrics_cli

    mdir = tmp_path / "model" / "test" / "ours_1"
    for sub in ("renders", "gt"):
        (mdir / sub).mkdir(parents=True)
    img = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(mdir / "renders" / "0.png")
    Image.fromarray(img).save(mdir / "gt" / "0.png")

    monkeypatch.delenv("GSPLAT_LPIPS_WEIGHTS", raising=False)
    monkeypatch.setattr(L, "weights_path", lambda: None)
    rc = metrics_cli.main(["-m", str(tmp_path / "model")])
    assert rc == 0
    with open(tmp_path / "model" / "results.json") as f:
        results = json.load(f)
    assert results["ours_1"]["LPIPS"] is None
    assert results["ours_1"]["LPIPS_status"] == "weights_unavailable"
