"""End-to-end host training loop on a tiny synthetic Blender dataset (CPU).

Covers the layer the unit tests can't: dataset reading -> Scene -> init ->
jitted steps -> densify/opacity-reset cadence -> snapshot save/load. Uses the
jnp backend (Pallas runs in interpreter mode on CPU and would be slow here).
"""

import dataclasses
import json
import os

import numpy as np
import pytest

from gsplat_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig


def test_train_loop_end_to_end(mini_blender, tmp_path):
    from gsplat_tpu.train.loop import train

    model_cfg = ModelConfig(
        source_path=mini_blender,
        model_path=str(tmp_path / "model"),
        white_background=True,
        eval=True,
        sh_degree=1,
    )
    opt = OptimizationConfig(
        iterations=24,
        densification_interval=8,
        densify_from_iter=4,
        densify_until_iter=22,
        opacity_reset_interval=16,
    )
    pipe = PipelineConfig(
        backend="jnp", instance_capacity=1 << 14, max_per_tile=256, capacity=4096
    )
    # tiny random init is injected by monkeypatching the reader's 100k default
    import gsplat_tpu.data.readers as readers

    orig = readers.read_blender_scene_info

    def small_scene(path, **kw):
        info = orig(path, **kw)
        rng = np.random.default_rng(0)
        n = 512
        info.points = (rng.random((n, 3)) * 2.6 - 1.3).astype(np.float32)
        info.colors = rng.random((n, 3)).astype(np.float32)
        info.normals = np.zeros((n, 3), np.float32)
        return info

    readers.read_blender_scene_info = small_scene
    readers.read_scene_info.__globals__["read_blender_scene_info"] = small_scene
    try:
        state, scene, results = train(
            model_cfg, opt, pipe,
            testing_iterations=(24,), saving_iterations=(24,),
            checkpoint_iterations=(24,), quiet=True,
        )
    finally:
        readers.read_blender_scene_info = orig
        readers.read_scene_info.__globals__["read_blender_scene_info"] = orig

    assert results["test"], "test eval must run"
    ev = results["test"][24]
    assert np.isfinite(ev["psnr"]) and ev["psnr"] > 5

    # snapshot written in the reference layout and loadable
    from gsplat_tpu.io.snapshot import load_snapshot

    params, alive, it, _ = load_snapshot(model_cfg.model_path)
    assert it == 24
    assert int(alive.sum()) > 0
    # checkpoint resume restores exact state
    from gsplat_tpu.train.loop import load_checkpoint

    st2, it2 = load_checkpoint(os.path.join(model_cfg.model_path, "chkpnt24.pkl"))
    assert it2 == 24
    np.testing.assert_array_equal(np.asarray(st2.alive), np.asarray(state.alive))
    np.testing.assert_allclose(
        np.asarray(st2.params.xyz), np.asarray(state.params.xyz)
    )
    assert os.path.exists(os.path.join(model_cfg.model_path, "exposure.json"))
    assert os.path.exists(os.path.join(model_cfg.model_path, "cameras.json"))


def test_auto_instance_capacity_probe_and_growth(mini_blender, monkeypatch):
    """instance_capacity=0 probes the scene, then grows on overflow.

    The probe is forced to lie (peak=1) so the first compiled step overflows
    immediately and the growth/recompile path must fire for training to
    recover full instance coverage.
    """
    import gsplat_tpu.train.loop as loop_mod
    import gsplat_tpu.data.readers as readers

    monkeypatch.setattr(loop_mod, "probe_instance_capacity", lambda *a, **k: 1)
    # drop the capacity floor so the tiny scene can actually overflow
    monkeypatch.setattr(
        loop_mod, "quantize_capacity",
        lambda n, floor=256: max(256, (int(n) + 127) // 128 * 128),
    )
    orig_ctl = loop_mod.CapacityController
    monkeypatch.setattr(
        loop_mod, "CapacityController",
        lambda cap, **kw: orig_ctl(cap, **{**kw, "floor": 256}),
    )

    orig = readers.read_blender_scene_info

    def small_scene(path, **kw):
        info = orig(path, **kw)
        rng = np.random.default_rng(0)
        n = 512
        info.points = (rng.random((n, 3)) * 2.6 - 1.3).astype(np.float32)
        info.colors = rng.random((n, 3)).astype(np.float32)
        info.normals = np.zeros((n, 3), np.float32)
        return info

    monkeypatch.setattr(readers, "read_blender_scene_info", small_scene)
    readers.read_scene_info.__globals__["read_blender_scene_info"] = small_scene
    try:
        model_cfg = ModelConfig(source_path=mini_blender, sh_degree=1, eval=True)
        opt = OptimizationConfig(iterations=8, densify_from_iter=100)
        pipe = PipelineConfig(
            backend="jnp", instance_capacity=0, max_per_tile=256, capacity=4096
        )
        state, scene, results = loop_mod.train(
            model_cfg, opt, pipe, testing_iterations=(8,), saving_iterations=(),
            quiet=True, log_every=1,
        )
    finally:
        readers.read_scene_info.__globals__["read_blender_scene_info"] = orig

    ev = results["test"][8]
    assert np.isfinite(ev["psnr"])
    # growth must have fired: 512 gaussians on a 48x48 grid emit far more
    # than the forced initial 256-slot capacity
    assert results.get("instance_capacity", 0) > 256


def test_gaussian_capacity_grows_during_densification(mini_blender, monkeypatch):
    """pipe.capacity=0 enables the gaussian-axis controller: with an
    aggressive densify cadence the alive count must cross the grow threshold
    and the state must be resized mid-run without corrupting training."""
    import gsplat_tpu.model as model_mod
    import gsplat_tpu.train.loop as loop_mod
    import gsplat_tpu.data.readers as readers

    orig_read = readers.read_blender_scene_info

    def small_scene(path, **kw):
        info = orig_read(path, **kw)
        rng = np.random.default_rng(0)
        n = 512
        info.points = (rng.random((n, 3)) * 2.6 - 1.3).astype(np.float32)
        info.colors = rng.random((n, 3)).astype(np.float32)
        info.normals = np.zeros((n, 3), np.float32)
        return info

    monkeypatch.setattr(readers, "read_blender_scene_info", small_scene)
    monkeypatch.setitem(
        readers.read_scene_info.__globals__, "read_blender_scene_info", small_scene
    )

    # small initial padding so growth fires within a few densify rounds
    orig_init = model_mod.init_from_pcd

    def tight_init(points, colors, **kw):
        kw.pop("capacity", None)
        return orig_init(points, colors, capacity=1024, **kw)

    monkeypatch.setattr(loop_mod, "init_from_pcd", tight_init)

    model_cfg = ModelConfig(source_path=mini_blender, sh_degree=1, eval=True)
    opt = OptimizationConfig(
        iterations=16, densify_from_iter=1, densification_interval=2,
        densify_until_iter=100, densify_grad_threshold=0.0,
        opacity_reset_interval=1000,
    )
    pipe = PipelineConfig(
        backend="jnp", instance_capacity=1 << 15, max_per_tile=256, capacity=0
    )
    state, scene, results = loop_mod.train(
        model_cfg, opt, pipe, testing_iterations=(16,), saving_iterations=(),
        quiet=True, log_every=4,
    )
    assert state.params.capacity > 1024  # growth fired
    assert int(np.asarray(state.alive).sum()) > 500
    assert np.isfinite(results["test"][16]["psnr"])


def test_rolling_checkpoint_and_resume(mini_blender, monkeypatch, tmp_path):
    """checkpoint_every writes the rolling checkpoint asynchronously; a
    fresh train() resumed from it continues at the right iteration with the
    full state (params AND Adam moments) intact."""
    import jax.numpy as jnp

    import gsplat_tpu.data.readers as readers
    import gsplat_tpu.train.loop as loop_mod

    orig = readers.read_blender_scene_info

    def small_scene(path, **kw):
        info = orig(path, **kw)
        rng = np.random.default_rng(0)
        n = 256
        info.points = (rng.random((n, 3)) * 2.6 - 1.3).astype(np.float32)
        info.colors = rng.random((n, 3)).astype(np.float32)
        info.normals = np.zeros((n, 3), np.float32)
        return info

    monkeypatch.setattr(readers, "read_blender_scene_info", small_scene)
    monkeypatch.setitem(
        readers.read_scene_info.__globals__, "read_blender_scene_info", small_scene
    )

    model_cfg = ModelConfig(
        source_path=mini_blender, model_path=str(tmp_path / "m"),
        white_background=True, eval=True, sh_degree=1,
    )
    opt = OptimizationConfig(iterations=8, densify_from_iter=100)
    pipe = PipelineConfig(
        backend="jnp", instance_capacity=1 << 13, max_per_tile=256, capacity=1024
    )
    train = loop_mod.train
    state8, _, _ = train(
        model_cfg, opt, pipe, testing_iterations=(), saving_iterations=(),
        quiet=True, checkpoint_every=4,
    )
    rolling = os.path.join(model_cfg.model_path, "rolling_chkpnt.pkl")
    assert os.path.exists(rolling)
    loaded, it = loop_mod.load_checkpoint(rolling)
    assert it == 8  # flushed at train end, so it holds the LAST multiple of 4
    np.testing.assert_array_equal(
        np.asarray(loaded.params.xyz), np.asarray(state8.params.xyz)
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.adam_m.xyz), np.asarray(state8.adam_m.xyz)
    )

    # resume for 4 more iterations; params must keep training (change)
    opt12 = dataclasses.replace(opt, iterations=12)
    state12, _, _ = train(
        model_cfg, opt12, pipe, testing_iterations=(), saving_iterations=(),
        quiet=True, start_checkpoint=rolling,
    )
    assert not np.allclose(
        np.asarray(state12.params.xyz), np.asarray(state8.params.xyz)
    )


def test_depth_regularized_training(mini_blender, monkeypatch, tmp_path):
    """--depths end-to-end on the Blender path: depth PNGs load through the
    /512 synthetic scaling, depth_reliable gates the expon-weighted depth-L1,
    and the metric is finite and nonzero during training."""
    from PIL import Image

    import gsplat_tpu.data.readers as readers
    import gsplat_tpu.train.loop as loop_mod

    # add a 16-bit depth PNG per training view
    ddir = os.path.join(mini_blender, "depth")
    os.makedirs(ddir, exist_ok=True)
    rng = np.random.default_rng(3)
    for i in range(3):
        d = (rng.random((48, 48)) * 2000 + 500).astype(np.uint16)
        Image.fromarray(d, mode="I;16").save(os.path.join(ddir, f"r_{i}.png"))

    orig = readers.read_blender_scene_info

    def small_scene(path, **kw):
        info = orig(path, **kw)
        r = np.random.default_rng(0)
        n = 256
        info.points = (r.random((n, 3)) * 2.6 - 1.3).astype(np.float32)
        info.colors = r.random((n, 3)).astype(np.float32)
        info.normals = np.zeros((n, 3), np.float32)
        return info

    monkeypatch.setattr(readers, "read_blender_scene_info", small_scene)
    monkeypatch.setitem(
        readers.read_scene_info.__globals__, "read_blender_scene_info", small_scene
    )

    model_cfg = ModelConfig(
        source_path=mini_blender, model_path=str(tmp_path / "m"),
        white_background=True, eval=True, sh_degree=1, depths="depth",
    )
    opt = OptimizationConfig(iterations=6, densify_from_iter=100, depth_l1_weight_init=1.0)
    pipe = PipelineConfig(
        backend="jnp", instance_capacity=1 << 13, max_per_tile=256, capacity=1024
    )

    seen = []

    def hook(iteration, state, metrics):
        seen.append(float(metrics["depth_l1"]))

    state, scene, _ = loop_mod.train(
        model_cfg, opt, pipe, testing_iterations=(), saving_iterations=(),
        quiet=True, on_iteration=hook,
    )
    cams = scene.get_train_cameras()
    assert all(c.depth_reliable for c in cams)
    assert all(c.invdepth is not None for c in cams)
    assert np.isfinite(seen).all()
    assert max(seen) > 0.0  # the depth term actually contributed


def test_train_loop_sharded_mesh(mini_blender, tmp_path):
    """`--mesh 4x2` drives the whole loop through the GSPMD sharded step on
    the 8-virtual-device CPU mesh: train a few iterations across a densify
    round, then check the numbers are finite and the state stays consistent."""
    from gsplat_tpu.train.loop import train
    import gsplat_tpu.data.readers as readers

    model_cfg = ModelConfig(
        source_path=mini_blender,
        model_path=str(tmp_path / "model"),
        white_background=True,
        eval=True,
        sh_degree=1,
    )
    opt = OptimizationConfig(
        iterations=12,
        densification_interval=8,
        densify_from_iter=4,
        densify_until_iter=11,
        opacity_reset_interval=16,
    )
    pipe = PipelineConfig(
        backend="jnp", instance_capacity=1 << 14, max_per_tile=256,
        capacity=4096, mesh="4x2",
    )

    orig = readers.read_blender_scene_info

    def small_scene(path, **kw):
        info = orig(path, **kw)
        rng = np.random.default_rng(0)
        n = 512
        info.points = (rng.random((n, 3)) * 2.6 - 1.3).astype(np.float32)
        info.colors = rng.random((n, 3)).astype(np.float32)
        info.normals = np.zeros((n, 3), np.float32)
        return info

    readers.read_blender_scene_info = small_scene
    readers.read_scene_info.__globals__["read_blender_scene_info"] = small_scene
    try:
        state, scene, results = train(
            model_cfg, opt, pipe,
            testing_iterations=(12,), saving_iterations=(), quiet=True,
        )
    finally:
        readers.read_blender_scene_info = orig
        readers.read_scene_info.__globals__["read_blender_scene_info"] = orig

    ev = results["test"][12]
    assert np.isfinite(ev["psnr"]) and ev["psnr"] > 5
    assert int(state.alive.sum()) > 0
    # params actually live sharded on the mesh
    shard_devs = {d for s in state.params.xyz.addressable_shards for d in [s.device]}
    assert len(shard_devs) > 1, "params should be sharded across devices"


def test_train_loop_pipeline_band_exchange(mini_blender64, tmp_path, capsys):
    """On a 64x64 scene (4 tile rows) `--mesh 4x2` takes the explicit
    shard_map pipeline, and the default exchange_capacity=-1 auto-sizes the
    band-bucketed packet exchange: training runs through it end to end with
    no band overflow."""
    from gsplat_tpu.train.loop import train
    import gsplat_tpu.data.readers as readers

    model_cfg = ModelConfig(
        source_path=mini_blender64,
        model_path=str(tmp_path / "model"),
        white_background=True,
        eval=True,
        sh_degree=1,
    )
    opt = OptimizationConfig(
        iterations=10,
        densification_interval=8,
        densify_from_iter=4,
        densify_until_iter=9,
        opacity_reset_interval=16,
    )
    pipe = PipelineConfig(
        backend="jnp", instance_capacity=1 << 14, max_per_tile=256,
        capacity=4096, mesh="4x2",
    )

    orig = readers.read_blender_scene_info

    def small_scene(path, **kw):
        info = orig(path, **kw)
        rng = np.random.default_rng(0)
        n = 512
        info.points = (rng.random((n, 3)) * 2.6 - 1.3).astype(np.float32)
        info.colors = rng.random((n, 3)).astype(np.float32)
        info.normals = np.zeros((n, 3), np.float32)
        return info

    readers.read_blender_scene_info = small_scene
    readers.read_scene_info.__globals__["read_blender_scene_info"] = small_scene
    try:
        state, scene, results = train(
            model_cfg, opt, pipe,
            testing_iterations=(10,), saving_iterations=(), quiet=True,
        )
    finally:
        readers.read_blender_scene_info = orig
        readers.read_scene_info.__globals__["read_blender_scene_info"] = orig

    out = capsys.readouterr().out
    assert "[auto] exchange capacity" in out, "auto-sizing should report"
    ev = results["test"][10]
    assert np.isfinite(ev["psnr"]) and ev["psnr"] > 5
    assert int(state.alive.sum()) > 0


def test_pipeline_band_overflow_surfaces(mini_blender64, tmp_path, capsys):
    """An undersized FIXED exchange_capacity must surface as the
    band_overflow warning (never silent truncation), and training must
    stay finite — the same contract as the instance buffer."""
    from gsplat_tpu.train.loop import train
    import gsplat_tpu.data.readers as readers

    model_cfg = ModelConfig(
        source_path=mini_blender64,
        model_path=str(tmp_path / "model"),
        white_background=True,
        eval=True,
        sh_degree=0,
    )
    opt = OptimizationConfig(iterations=3, densify_from_iter=99,
                             densify_until_iter=0)
    pipe = PipelineConfig(
        backend="jnp", instance_capacity=1 << 14, max_per_tile=256,
        capacity=2048, mesh="4x2", exchange_capacity=128,  # way undersized
    )

    orig = readers.read_blender_scene_info

    def small_scene(path, **kw):
        info = orig(path, **kw)
        rng = np.random.default_rng(0)
        n = 512
        info.points = (rng.random((n, 3)) * 2.6 - 1.3).astype(np.float32)
        info.colors = rng.random((n, 3)).astype(np.float32)
        info.normals = np.zeros((n, 3), np.float32)
        return info

    readers.read_blender_scene_info = small_scene
    readers.read_scene_info.__globals__["read_blender_scene_info"] = small_scene
    try:
        state, scene, results = train(
            model_cfg, opt, pipe,
            testing_iterations=(), saving_iterations=(), quiet=True,
            log_every=1,
        )
    finally:
        readers.read_blender_scene_info = orig
        readers.read_scene_info.__globals__["read_blender_scene_info"] = orig

    err = capsys.readouterr().err
    assert "band exchange overflow" in err
    assert np.isfinite(float(np.asarray(state.params.xyz).sum()))
