#!/usr/bin/env python
"""Round-5: band-exchange capacity CURVE on the real chip (verdict item 6).

Round 4 measured the band-compacted front-end at ONE capacity (14.9 ->
6.0 ms); the auto-sizer's policy rested on that single datum. This probe
sweeps exchange_capacity over >=4 values at the 262k trained-statistics
point (mesh 1x1 — the exchange's compaction/rebase stages run for real;
the all_gather is a no-op, so the measured delta is exactly the post-
gather front-end cost the capacity controls) and prints step time vs
capacity as JSON.

Usage: python -m scripts.probe_r5_bandcurve [n_gauss]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(n=262_144, width=1920, height=1080):
    from __graft_entry__ import _tiny_scene
    from gsplat_tpu.capacity import probe_instance_capacity, round128
    from gsplat_tpu.config import OptimizationConfig
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.parallel.pipeline import make_pipeline_train_step
    from gsplat_tpu.parallel.sharding import make_mesh, place_train_state
    from gsplat_tpu.train.step import init_train_state

    params, alive, camera = _tiny_scene(
        n=n, width=width, height=height, sh_degree=3, capacity=n
    )
    holder = type("H", (), {"camera": camera})
    peak = probe_instance_capacity(params, alive, [holder])
    settings = make_render_settings(
        sh_degree=3, max_per_tile=2048, instance_capacity=round128(peak),
        backend="pallas", packet_dtype="hybrid",
    )
    mesh = make_mesh(n_gauss=1, n_tile=1)
    opt = OptimizationConfig()
    gt = jnp.zeros((height, width, 3), jnp.float32)
    ones = jnp.ones((height, width, 1), jnp.float32)
    zeros = jnp.zeros((height, width), jnp.float32)
    args = (camera, gt, ones, zeros, zeros, jnp.zeros(3),
            jnp.float32(1e-4), jnp.float32(1e-3), jnp.float32(0.0),
            jnp.int32(0))

    # live rows that actually intersect the (single) band ~= projected,
    # unculled gaussians; capacities sweep from snug to the full shard
    state0 = init_train_state(params, alive, num_images=2)
    rows = {}
    caps = [None, n, n // 2, n // 4, n // 8, n // 16]
    for cap in caps:
        step = make_pipeline_train_step(
            mesh, opt, settings, width, height, use_exposure=True,
            exchange_capacity=cap,
        )
        st = place_train_state(mesh, state0)
        t = timeit(step, st, *args)
        _, m = step(st, *args)
        key = "full_gather" if cap is None else str(cap)
        rows[key] = {
            "step_ms": round(t * 1e3, 2),
            "band_count": int(m["band_count"]),
            "band_overflow": int(m["band_overflow"]),
            "loss": round(float(m["loss"]), 6),
        }
        print(f"exchange_capacity={key}: {rows[key]}", flush=True)
    print(json.dumps({"n": n, "instance_capacity": settings.instance_capacity,
                      "curve": rows}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 262_144)
