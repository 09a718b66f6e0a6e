#!/usr/bin/env python
"""Headline benchmark: rasterizer pixels/s (forward+backward) at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Scenario follows BASELINE.json's north-star metric: a garden-class scene
(~250k Gaussians visible at 1920x1080), full differentiable render — forward
+ gradient of an L1 loss w.r.t. all Gaussian parameters — timed on one chip.
`vs_baseline` is measured against the reference's only published render-rate
number: the 3DGS paper's >=30 fps at 1080p (`README.md:14`), i.e.
1920*1080*30 = 62.2M pixels/s forward-only on a paper-era CUDA GPU.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_PIXELS_PER_S = 1920 * 1080 * 30.0


def main():
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.render import render
    from __graft_entry__ import _tiny_scene

    width, height = 1920, 1080
    n = 262_144
    params, alive, camera = _tiny_scene(n=n, width=width, height=height, sh_degree=3, capacity=n)

    # right-size the instance buffer to the scene (capacity-proportional
    # stages — instance sort, chunk gathers, pack row-gather, the backward
    # segment reduction — pay per compiled slot, not per real instance)
    from gsplat_tpu.capacity import probe_instance_capacity, round128

    cam_holder = type("CamHolder", (), {"camera": camera})
    peak = probe_instance_capacity(params, alive, [cam_holder])
    settings = make_render_settings(
        sh_degree=3,
        max_per_tile=2048,
        # the probe is exact for this fixed camera, so size to it exactly
        instance_capacity=round128(peak),
        backend="pallas",
    )

    def loss_fn(params, alive):
        out = render(camera, params, alive, settings, jnp.zeros(3))
        return out["render"].mean() + 0.0 * out["invdepth"].mean()

    step = jax.jit(jax.grad(loss_fn))

    # warmup/compile
    g = step(params, alive)
    jax.block_until_ready(g)

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(params, alive)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / iters

    pixels_per_s = width * height / dt
    print(
        json.dumps(
            {
                "metric": "pixels/s/chip fwd+bwd, 1080p, 262k gaussians",
                "value": round(pixels_per_s, 1),
                "unit": "pixels/s",
                "vs_baseline": round(pixels_per_s / BASELINE_PIXELS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
