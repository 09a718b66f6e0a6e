#!/usr/bin/env python
"""Render CLI — per-view PNG dumps of a trained model (reference `render.py:30-76`).

Writes `{model}/{train,test}/ours_{iter}/renders/*.png` and `gt/*.png`,
directory layout identical to the reference so `metrics.py` (ours or theirs)
can evaluate either.
"""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import numpy as np


def render_set(model_path, name, iteration, cameras, params, alive, settings, bg, use_exposure, exposures):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gsplat_tpu.render import render as render_fn

    base = os.path.join(model_path, name, f"ours_{iteration}")
    renders_dir = os.path.join(base, "renders")
    gt_dir = os.path.join(base, "gt")
    os.makedirs(renders_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)

    if use_exposure and exposures is not None:
        jitted = jax.jit(
            lambda cam, p, a, exp: render_fn(cam, p, a, settings, bg, exposure=exp)
        )
    else:
        jitted = jax.jit(lambda cam, p, a: render_fn(cam, p, a, settings, bg))
    def write_view(idx, out, gt):
        img = np.asarray(out["render"])  # device->host sync happens here
        if use_exposure:  # reference keeps only the right half in train_test_exp mode
            img = img[:, img.shape[1] // 2 :]
            gt = gt[:, gt.shape[1] // 2 :]
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(renders_dir, f"{idx:05d}.png")
        )
        Image.fromarray((np.clip(gt, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(gt_dir, f"{idx:05d}.png")
        )

    # one-deep pipeline: dispatch view i+1 (async) before syncing/encoding
    # view i, so PNG encoding overlaps the device render
    pending = None
    for idx, cam in enumerate(cameras):
        if use_exposure and exposures is not None:
            exp = jnp.asarray(
                exposures.get(cam.image_name, np.eye(3, 4, dtype=np.float32))
            )
            out = jitted(cam.camera, params, alive, exp)
        else:
            out = jitted(cam.camera, params, alive)
        if pending is not None:
            write_view(*pending)
        pending = (idx, out, cam.image)
    if pending is not None:
        write_view(*pending)


def main(argv=None):
    from gsplat_tpu.config import (
        ModelConfig,
        PipelineConfig,
        add_to_parser,
        extract,
        load_cfg_args,
    )

    parser = ArgumentParser(description="gsplat_tpu rendering")
    add_to_parser(parser, ModelConfig(), "Loading Parameters", fill_none=True)
    add_to_parser(parser, PipelineConfig(), "Pipeline Parameters")
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    args = load_cfg_args(parser, argv)
    model_cfg = extract(ModelConfig, args)
    pipe_cfg = extract(PipelineConfig, args)

    import jax.numpy as jnp

    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.io.snapshot import load_snapshot

    print(f"Rendering {model_cfg.model_path}")
    params, alive, iteration, exposures = load_snapshot(
        model_cfg.model_path, args.iteration
    )
    scene = Scene(
        model_cfg.source_path,
        model_path=None,
        images=model_cfg.images,
        depths=model_cfg.depths,
        resolution=model_cfg.resolution,
        white_background=model_cfg.white_background,
        eval=model_cfg.eval,
        train_test_exp=model_cfg.train_test_exp,
        shuffle=False,
    )
    from gsplat_tpu.capacity import resolve_instance_capacity

    probe_cams = scene.get_train_cameras() + scene.get_test_cameras()
    settings = make_render_settings(
        sh_degree=model_cfg.sh_degree,
        instance_capacity=resolve_instance_capacity(
            pipe_cfg.instance_capacity, params, alive, probe_cams
        ),
        max_per_tile=pipe_cfg.max_per_tile,
        antialiasing=pipe_cfg.antialiasing,
        backend=pipe_cfg.backend,
        blend_mode=getattr(pipe_cfg, "blend_mode", "sorted"),
    )
    bg = jnp.ones(3) if model_cfg.white_background else jnp.zeros(3)

    if pipe_cfg.mesh:
        # distribute the render over a (gauss x tile) device mesh: params
        # row-sharded, per-view jit auto-partitioned by GSPMD
        from gsplat_tpu.parallel.sharding import make_mesh, shard_params

        parts = pipe_cfg.mesh.lower().split("x")
        if len(parts) != 2 or not all(p.isdigit() for p in parts):
            raise ValueError(f"--mesh must be 'GxT' (e.g. 4x2), got {pipe_cfg.mesh!r}")
        mesh = make_mesh(int(parts[0]), int(parts[1]))
        params, alive = shard_params(params, alive, mesh)
        print(f"[mesh] rendering over gauss={parts[0]} x tile={parts[1]}")

    if not args.skip_train:
        render_set(
            model_cfg.model_path, "train", iteration, scene.get_train_cameras(),
            params, alive, settings, bg, model_cfg.train_test_exp, exposures,
        )
    if not args.skip_test:
        render_set(
            model_cfg.model_path, "test", iteration, scene.get_test_cameras(),
            params, alive, settings, bg, model_cfg.train_test_exp, exposures,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
