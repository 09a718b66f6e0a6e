#!/usr/bin/env python
"""Render-only (forward, no gradients) serving rate at 1080p — the
comparison point for the reference paper's >=30 fps @1080p claim
(62.2 Mpix/s). Measures f32 parity, hybrid, and all-bf16 packets (bf16 is
certified-out for TRAINING but remains a legitimate serving mode)."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _tiny_scene
from gsplat_tpu.capacity import probe_instance_capacity, round128
from gsplat_tpu.core.types import make_render_settings
from gsplat_tpu.render import render


def main(n=262_144, width=1920, height=1080, iters=10):
    params, alive, camera = _tiny_scene(
        n=n, width=width, height=height, sh_degree=3, capacity=n
    )
    holder = type("H", (), {"camera": camera})
    peak = probe_instance_capacity(params, alive, [holder])
    out = {"n": n, "instances": int(peak)}
    for mode in ("float32", "hybrid", "bfloat16"):
        settings = make_render_settings(
            sh_degree=3, max_per_tile=2048, instance_capacity=round128(peak),
            backend="pallas", packet_dtype=mode,
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
        out[mode] = {
            "ms": round(dt * 1e3, 2),
            "mpix_per_s": round(width * height / dt / 1e6, 1),
            "vs_paper_30fps": round(width * height / dt / 62.2e6, 3),
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
