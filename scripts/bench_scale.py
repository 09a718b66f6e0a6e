#!/usr/bin/env python
"""Gaussian-count scaling of the differentiable render on one chip.

BASELINE.json configs 3-5 scale the scene from ~250k (garden-class) through
10M+ gaussians; multi-chip hardware is not available here, so this measures
the single-chip axis of that story: fwd+bwd render rate at 1080p as N grows
(the reference streams 32k-gaussian chunks through the NPU instead —
`npu-1/base.cpp:137` — and never goes past one device).

Run on the real TPU: `python scripts/bench_scale.py [N ...]`
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(ns=None):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_scene
    from gsplat_tpu.capacity import probe_instance_capacity, round128
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.render import render

    width, height = 1920, 1080
    ns = [int(n) for n in (ns or [262_144, 1_048_576, 4_194_304])]
    for n in ns:
        params, alive, camera = _tiny_scene(
            n=n, width=width, height=height, sh_degree=3, capacity=n
        )
        cam_holder = type("H", (), {"camera": camera})
        peak = probe_instance_capacity(params, alive, [cam_holder])
        settings = make_render_settings(
            sh_degree=3, max_per_tile=8192,
            instance_capacity=round128(peak), backend="pallas",
        )

        def loss_fn(p, a):
            out = render(camera, p, a, settings, jnp.zeros(3))
            return out["render"].mean() + 0.0 * out["invdepth"].mean()

        step = jax.jit(jax.grad(loss_fn))
        g = step(params, alive)
        jax.block_until_ready(g)
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            g = step(params, alive)
        jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / iters
        print(
            f"N={n:>9,}  instances={peak:>10,}  {dt * 1e3:8.1f} ms/frame  "
            f"{width * height / dt / 1e6:6.1f} Mpix/s  "
            f"{n / dt / 1e6:7.1f} Mgauss/s",
            flush=True,
        )


if __name__ == "__main__":
    main(sys.argv[1:] or None)
