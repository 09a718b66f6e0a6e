#!/usr/bin/env python
"""OIT-mode bench point (same scenario as bench.py's 262k point)."""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from gsplat_tpu.capacity import probe_instance_capacity, round128
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.render import render
    from __graft_entry__ import _tiny_scene

    width, height, n = 1920, 1080, 262_144
    params, alive, camera = _tiny_scene(n=n, width=width, height=height,
                                        sh_degree=3, capacity=n)
    peak = probe_instance_capacity(params, alive, [type("C", (), {"camera": camera})])
    out = {}
    for mode in ("sorted", "oit"):
        settings = make_render_settings(
            sh_degree=3, max_per_tile=2048, instance_capacity=round128(peak),
            backend="pallas", blend_mode=mode,
        )

        def loss_fn(p, a):
            o = render(camera, p, a, settings, jnp.zeros(3))
            return o["render"].mean() + 0.0 * o["invdepth"].mean()

        step = jax.jit(jax.grad(loss_fn))
        g = step(params, alive)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for _ in range(8):
            g = step(params, alive)
        jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / 8
        out[mode] = round(width * height / dt / 1e6, 2)
    print(json.dumps({"metric": "Mpix/s fwd+bwd 1080p 262k", **out}))


if __name__ == "__main__":
    main()
