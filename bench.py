#!/usr/bin/env python
"""Headline benchmark: rasterizer pixels/s (forward+backward) at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
BASELINE-defined config — a garden-class scene (~1M gaussians at 1920x1080)
— plus a `points` field with the f32 parity path and the 262k-gaussian
point rounds 1-2 headlined, so both ends of the scaling curve are
driver-recorded.

The headline runs the TRAINING default configuration: hybrid instance
packets (positions f32, value columns + backward-reduce payload
bf16-pair-packed through the sorts) — quality-certified end to end by the
lego-30k run in artifacts/cert_r4 (the all-bf16 mode FAILED that
certification and is not used). `points.garden_f32` is the strict parity
path.

`vs_baseline` is measured against the reference's only published
render-rate number: the 3DGS paper's >=30 fps at 1080p (`README.md:14`),
i.e. 1920*1080*30 = 62.2M pixels/s forward-only on a paper-era CUDA GPU.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_PIXELS_PER_S = 1920 * 1080 * 30.0


def measure(n: int, packet_dtype="float32", width: int = 1920,
            height: int = 1080, iters: int = 8):
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.capacity import probe_instance_capacity, round128
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.render import render
    from __graft_entry__ import _tiny_scene

    params, alive, camera = _tiny_scene(
        n=n, width=width, height=height, sh_degree=3, capacity=n
    )

    # right-size the instance buffer to the scene (capacity-proportional
    # stages — instance sort, chunk gathers, the backward sort-back — pay
    # per compiled slot, not per real instance). The probe counts POST-cull
    # emission (run-trimmed; ops/binning.py).
    cam_holder = type("CamHolder", (), {"camera": camera})
    peak = probe_instance_capacity(params, alive, [cam_holder])
    settings = make_render_settings(
        sh_degree=3,
        max_per_tile=2048,
        # the probe is exact for this fixed camera, so size to it exactly
        instance_capacity=round128(peak),
        backend="pallas",
        packet_dtype=packet_dtype,
    )

    def loss_fn(params, alive):
        out = render(camera, params, alive, settings, jnp.zeros(3))
        return out["render"].mean() + 0.0 * out["invdepth"].mean()

    step = jax.jit(jax.grad(loss_fn))
    g = step(params, alive)  # warmup/compile
    jax.block_until_ready(g)

    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(params, alive)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / iters
    return width * height / dt, int(peak)


def measure_render_only(n: int, packet_dtype="hybrid", width: int = 1920,
                        height: int = 1080, iters: int = 20):
    """Forward-only (no-grad) serving rate on the synthetic garden-class
    cloud — the comparison point for the reference's only published perf
    number, >=30 fps @ 1080p (`/root/reference/README.md:14`)."""
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.capacity import probe_instance_capacity, round128
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.render import render
    from __graft_entry__ import _tiny_scene

    params, alive, camera = _tiny_scene(
        n=n, width=width, height=height, sh_degree=3, capacity=n
    )
    cam_holder = type("CamHolder", (), {"camera": camera})
    peak = probe_instance_capacity(params, alive, [cam_holder])
    settings = make_render_settings(
        sh_degree=3, max_per_tile=2048, instance_capacity=round128(peak),
        backend="pallas", packet_dtype=packet_dtype,
    )
    fwd = jax.jit(
        lambda p, a: render(camera, p, a, settings, jnp.zeros(3))["render"]
    )
    img = fwd(params, alive)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for _ in range(iters):
        img = fwd(params, alive)
    jax.block_until_ready(img)
    dt = (time.perf_counter() - t0) / iters
    return width * height / dt, int(peak)


def measure_render_only_trained(model_dir: str, source: str,
                                packet_dtype="hybrid", iters: int = 20):
    """Forward-only rate on a TRAINED 30k checkpoint (real-scene splat
    statistics) — skipped gracefully when the workspace lacks the trained
    cloud or dataset (both are session artifacts, not git-tracked)."""
    import os

    if not (os.path.isdir(model_dir) and os.path.isdir(source)):
        return None
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.capacity import probe_instance_capacity, round128
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.io.snapshot import load_snapshot
    from gsplat_tpu.render import render

    params, alive, _, _ = load_snapshot(model_dir, 30000)
    scene = Scene(source, model_path=None, images="images", depths="",
                  resolution=-1, white_background=True, eval=True,
                  train_test_exp=False, shuffle=False)
    cam = scene.get_train_cameras()[0].camera
    holder = type("H", (), {"camera": cam})
    peak = probe_instance_capacity(params, alive, [holder])
    settings = make_render_settings(
        sh_degree=3, max_per_tile=2048, instance_capacity=round128(peak),
        backend="pallas", packet_dtype=packet_dtype,
    )
    fwd = jax.jit(
        lambda p, a: render(cam, p, a, settings, jnp.ones(3))["render"]
    )
    img = fwd(params, alive)
    jax.block_until_ready(img)

    def timed():
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, alive)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    # The tunneled axon transport occasionally drops into a "fake fast"
    # mode where dispatches return without executing (observed 2026-08-21:
    # a trained-cloud frame reported 0.04 ms ≈ 16 Gpix/s). No real frame
    # on this chip is under ~2 ms; retry once, then flag rather than
    # report an impossible number.
    dt = timed()
    if dt * 1e3 < 2.0:
        img = fwd(params, alive)
        jax.block_until_ready(img)
        dt = timed()
    if dt * 1e3 < 2.0:
        return {"invalid": "transport_glitch_fake_fast",
                "ms": round(dt * 1e3, 3)}
    width, height = int(cam.width), int(cam.height)
    return {
        "pixels_per_s": round(width * height / dt, 1),
        "ms": round(dt * 1e3, 2),
        "n_gauss": int(__import__("numpy").asarray(alive).sum()),
        "vs_baseline": round((width * height / dt) / BASELINE_PIXELS_PER_S, 4),
    }


def main():
    # garden-scale first (the BASELINE metric is defined on garden, ~1M
    # gaussians at 1080p); the 262k point keeps continuity with rounds 1-2
    garden_rate, garden_inst = measure(n=1_048_576, packet_dtype="hybrid")
    garden_f32, _ = measure(n=1_048_576, packet_dtype="float32")
    small_rate, small_inst = measure(n=262_144, packet_dtype="hybrid")
    # render-only (serving) rate vs the reference's only published perf
    # number, >=30 fps @ 1080p forward-only (= BASELINE_PIXELS_PER_S)
    ro_garden, _ = measure_render_only(n=1_048_576, packet_dtype="hybrid")
    render_only = {
        "1M_gauss_1080p": {
            "pixels_per_s": round(ro_garden, 1),
            "vs_baseline": round(ro_garden / BASELINE_PIXELS_PER_S, 4),
        },
    }
    # trained clouds are session artifacts; scan the rounds' output dirs
    # newest-first and take the first checkpoint that exists per scene
    trained_candidates = {
        "chair": ["output/seeds_r5/chair_seed1", "output/seeds_r5/chair_seed2",
                  "output/full_eval_r5/chair", "output/full_eval_r3/chair"],
        "ship": ["output/full_eval_r5/ship", "output/full_eval_r3/ship"],
        "lego": ["output/sparse_ab_r5/lego_dense",
                 "output/sparse_ab_r5/lego_sparse"],
        "mic": ["output/full_eval_r5/mic"],
    }
    for name, dirs in trained_candidates.items():
        src = f"/root/reference/nerf_synthetic/{name}"
        for scene in dirs:
            try:
                r = measure_render_only_trained(scene, src)
            except Exception:
                r = None
            if r is not None:
                render_only[name + "_30k_800px"] = r
                break
    px = 1920 * 1080
    print(
        json.dumps(
            {
                "metric": "pixels/s/chip fwd+bwd, 1080p, 1M gaussians (garden-class)",
                "value": round(garden_rate, 1),
                "unit": "pixels/s",
                "vs_baseline": round(garden_rate / BASELINE_PIXELS_PER_S, 4),
                "points": {
                    "1M_gauss": {
                        "pixels_per_s": round(garden_rate, 1),
                        "instances": garden_inst,
                        "ns_per_instance": round(
                            1e9 * (px / garden_rate) / max(garden_inst, 1), 2
                        ),
                    },
                    "1M_gauss_f32_parity": {
                        "pixels_per_s": round(garden_f32, 1),
                        "vs_baseline": round(garden_f32 / BASELINE_PIXELS_PER_S, 4),
                    },
                    "262k_gauss": {
                        "pixels_per_s": round(small_rate, 1),
                        "instances": small_inst,
                        "ns_per_instance": round(
                            1e9 * (px / small_rate) / max(small_inst, 1), 2
                        ),
                        "vs_baseline": round(small_rate / BASELINE_PIXELS_PER_S, 4),
                    },
                    "render_only": render_only,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
