#!/usr/bin/env python
"""Wall-clock the fully-jitted lego-shaped training step at several compiled
instance capacities, to attribute the train-loop cost (bench.py measures the
bare differentiable render; the train step adds SSIM, Adam, densify stats —
and pays capacity padding on every row-rate-bound stage)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import _tiny_scene
    from gsplat_tpu.capacity import probe_instance_capacity, round128
    from gsplat_tpu.config import OptimizationConfig
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.train.step import init_train_state, make_train_step

    width, height, n = 800, 800, 100_352  # lego steady state (cap = alive here)
    import itertools

    opt = OptimizationConfig()
    gt = jnp.zeros((height, width, 3), jnp.float32)
    bg = jnp.zeros(3)

    for gcap_mult, icap_kind in itertools.product([1.31, 8.0], ["tight", "big"]):
        params, alive, camera = _tiny_scene(n=n, width=width, height=height, sh_degree=3, capacity=round128(int(n * gcap_mult)))
        cam_holder = type("H", (), {"camera": camera})
        peak = probe_instance_capacity(params, alive, [cam_holder])
        cap = round128(int(peak * 1.4)) if icap_kind == "tight" else (1 << 22)
        settings = make_render_settings(
            sh_degree=3, max_per_tile=2048, instance_capacity=cap, backend="pallas"
        )
        step_fn = make_train_step(opt, settings)
        state = init_train_state(params, alive, num_images=100)
        mask = jnp.ones((height, width, 1), jnp.float32)
        invd = jnp.zeros((height, width), jnp.float32)
        dmask = jnp.zeros((height, width), jnp.float32)
        args = (camera, gt, mask, invd, dmask, bg,
                jnp.float32(1e-4), jnp.float32(1e-3), jnp.float32(0.0), jnp.int32(0))
        out = step_fn(state, *args)
        jax.block_until_ready(out[0].params.xyz)
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            out = step_fn(out[0], *args)
        jax.block_until_ready(out[0].params.xyz)
        dt = (time.perf_counter() - t0) / iters
        print(f"gcap {params.xyz.shape[0]:>7} icap {cap:>8}: {dt*1e3:8.1f} ms/step")


if __name__ == "__main__":
    main()
