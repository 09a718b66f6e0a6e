#!/usr/bin/env python
"""Round-5 serving bench: render-only rate on TRAINED 30k clouds vs the
reference's only published perf number (>=30 fps @ 1080p = 62.2 Mpix/s,
/root/reference/README.md:14).

Measures chair + ship (800x800, the scenes the paper's quality tables use)
and the synthetic garden-class 1M cloud at 1080p, each at FWD_UNROLL in
{1, 2, 4}, hybrid packets (exact positions; the quality-certified serving
mode). Prints JSON lines.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=15, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_cloud(tag, params, alive, camera, bg):
    from gsplat_tpu.capacity import probe_instance_capacity, round128
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.ops import rasterize_pallas as rp
    from gsplat_tpu.render import render

    holder = type("H", (), {"camera": camera})
    peak = probe_instance_capacity(params, alive, [holder])
    settings = make_render_settings(
        sh_degree=3, max_per_tile=2048, instance_capacity=round128(peak),
        backend="pallas", packet_dtype="hybrid",
    )
    w, h = int(camera.width), int(camera.height)
    row = {"scene": tag, "w": w, "h": h,
           "n_gauss": int(np.asarray(alive).sum()), "instances": int(peak)}
    configs = [("unroll1", 1, True, 1), ("unroll2", 2, True, 1),
               ("unroll4", 4, True, 1),
               # tile pairing (dead at garden scale, r4) may revive at
               # many-small-tile scale where per-invocation overhead bites
               ("unroll2_pair2", 2, True, 2),
               # attribution: the round-4 issue+wait-every-chunk drain
               ("unroll1_slowdrain", 1, False, 1)]
    for name, unroll, fast, pair in configs:
        rp.FWD_UNROLL = unroll
        rp.FAST_DRAIN = fast
        rp.TILES_PER_STEP = pair
        rp._make_blend_vjp.cache_clear()
        fwd = jax.jit(
            lambda p, a: render(camera, p, a, settings, bg)["render"]
        )
        t = timeit(fwd, params, alive)
        row[name] = {
            "ms": round(t * 1e3, 2),
            "mpix_per_s": round(w * h / t / 1e6, 1),
            "vs_paper_30fps": round(w * h / t / 62.2e6, 3),
        }
    rp.FWD_UNROLL = 1
    rp.FAST_DRAIN = True
    rp.TILES_PER_STEP = 1
    rp._make_blend_vjp.cache_clear()
    print(json.dumps(row), flush=True)


def main():
    from __graft_entry__ import _tiny_scene
    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.io.snapshot import load_snapshot

    candidates = (
        ("chair30k", ["output/seeds_r5/chair_seed1", "output/full_eval_r3/chair"],
         "/root/reference/nerf_synthetic/chair"),
        ("ship30k", ["output/full_eval_r5/ship", "output/full_eval_r3/ship"],
         "/root/reference/nerf_synthetic/ship"),
        ("lego30k", ["output/sparse_ab_r5/lego_dense"],
         "/root/reference/nerf_synthetic/lego"),
        ("mic30k", ["output/full_eval_r5/mic"],
         "/root/reference/nerf_synthetic/mic"),
    )
    for tag, dirs, source in candidates:
        model_dir = next(
            (d for d in dirs
             if os.path.isdir(os.path.join(d, "point_cloud", "iteration_30000"))),
            None,
        )
        if model_dir is None:
            print(json.dumps({"scene": tag, "skipped": "no checkpoint"}))
            continue
        params, alive, _, _ = load_snapshot(model_dir, 30000)
        scene = Scene(source, model_path=None, images="images", depths="",
                      resolution=-1, white_background=True, eval=True,
                      train_test_exp=False, shuffle=False)
        cam = scene.get_train_cameras()[0].camera
        bench_cloud(tag, params, alive, cam, jnp.ones(3))

    params, alive, camera = _tiny_scene(
        n=1_048_576, width=1920, height=1080, sh_degree=3, capacity=1_048_576
    )
    bench_cloud("garden1M_1080p", params, alive, camera, jnp.zeros(3))


if __name__ == "__main__":
    main()
