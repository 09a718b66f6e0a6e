"""CLI parity: train.py -> render.py -> metrics.py on the mini dataset (CPU).

Covers the reference's end-to-end workflow (`train.py` -> `render.py:30-60`
dir layout -> `metrics.py:36-93` results.json schema) through the real
argv entry points."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_model(mini_blender, tmp_path_factory):
    sys.path.insert(0, "/root/repo")
    import train as train_cli

    model_dir = str(tmp_path_factory.mktemp("cli_model"))
    # tiny init via reader monkeypatch (100k default would be slow on CPU)
    import gsplat_tpu.data.readers as readers

    orig = readers.read_blender_scene_info

    def small_scene(path, **kw):
        info = orig(path, **kw)
        rng = np.random.default_rng(0)
        info.points = (rng.random((256, 3)) * 2.6 - 1.3).astype(np.float32)
        info.colors = rng.random((256, 3)).astype(np.float32)
        info.normals = np.zeros((256, 3), np.float32)
        return info

    readers.read_scene_info.__globals__["read_blender_scene_info"] = small_scene
    try:
        rc = train_cli.main(
            [
                "-s", mini_blender, "-m", model_dir, "-w", "--eval",
                "--iterations", "10", "--sh_degree", "1",
                "--backend", "jnp", "--instance_capacity", str(1 << 13),
                "--max_per_tile", "256", "--capacity", "1024",
                "--test_iterations", "10", "--save_iterations", "10",
                "--disable_viewer", "--quiet", "--debug_from", "1",
            ]
        )
    finally:
        readers.read_scene_info.__globals__["read_blender_scene_info"] = orig
    assert rc == 0
    return model_dir


def test_render_and_metrics_cli(trained_model, mini_blender):
    import metrics as metrics_cli
    import render as render_cli

    rc = render_cli.main(
        [
            "-m", trained_model, "-s", mini_blender,
            "--backend", "jnp", "--instance_capacity", str(1 << 13),
            "--max_per_tile", "256", "--skip_train",
        ]
    )
    assert rc == 0
    out_dir = os.path.join(trained_model, "test", "ours_10")
    renders = os.listdir(os.path.join(out_dir, "renders"))
    gts = os.listdir(os.path.join(out_dir, "gt"))
    assert len(renders) == 3 and len(gts) == 3  # mini dataset has 3 test views

    rc = metrics_cli.main(["-m", trained_model])
    assert rc == 0
    with open(os.path.join(trained_model, "results.json")) as f:
        results = json.load(f)
    assert "ours_10" in results
    r = results["ours_10"]
    # LPIPS_status appears when weights are unavailable (LPIPS stays null)
    assert set(r) - {"LPIPS_status"} == {"SSIM", "PSNR", "LPIPS"}
    assert np.isfinite(r["PSNR"]) and np.isfinite(r["SSIM"])
    with open(os.path.join(trained_model, "per_view.json")) as f:
        per_view = json.load(f)
    assert len(per_view["ours_10"]["PSNR"]) == 3


def test_cfg_args_roundtrip(trained_model):
    """cfg_args persistence + CLI merge (`arguments/__init__.py:102-122`)."""
    from argparse import ArgumentParser

    from gsplat_tpu.config import ModelConfig, add_to_parser, load_cfg_args

    parser = ArgumentParser()
    add_to_parser(parser, ModelConfig(), "Loading", fill_none=True)
    args = load_cfg_args(parser, ["-m", trained_model])
    assert args.white_background is True
    assert args.sh_degree == 1
    assert args.eval is True
