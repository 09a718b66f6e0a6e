#!/usr/bin/env python
"""Measure the explicit shard_map pipeline's cost structure (VERDICT r3 #4).

Two measurements, both as JSON lines:

1. `--hw` (real chip, mesh 1x1): pipeline-vs-plain full train-step wall
   time. With one device the all_gather is a no-op, so the difference is
   the pure overhead of routing the step through shard_map + the band
   restrict/rebase stages.

2. CPU 8-virtual-device mesh 1x8: full-gather vs band-bucketed exchange
   step time. With the exchange, every post-gather stage (band restrict,
   pack/bin table build, cumsum, sort) runs on G*C compacted rows instead
   of N_global — the non-scaling front-end the round-3 cost model
   identified as the tile-axis scaling cap (docs/PERF_HEADROOM.md
   "Multi-chip cost model"). CPU wall time is not chip time, but the
   relative step cost isolates exactly the work the exchange removes.

Run:  python -m scripts.probe_pipeline_overhead         # CPU comparison
      python -m scripts.probe_pipeline_overhead --hw    # single-chip
"""

from __future__ import annotations

import json
import os
import sys
import time

if "--hw" not in sys.argv:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np

import jax

if "--hw" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def make_step(kind, mesh, settings, width, height, exchange):
    from gsplat_tpu.config import OptimizationConfig
    from gsplat_tpu.parallel.pipeline import make_pipeline_train_step
    from gsplat_tpu.train.step import make_train_step

    opt = OptimizationConfig()
    if kind == "plain":
        return make_train_step(opt, settings)
    return make_pipeline_train_step(
        mesh, opt, settings, width, height, exchange_capacity=exchange
    )


def run(step, state, camera, gt, iters=6):
    mask = jnp.ones_like(gt[..., :1])
    invd = jnp.zeros(gt.shape[:2])
    dmask = jnp.zeros(gt.shape[:2])
    bg = jnp.zeros(3)
    args = (camera, gt, mask, invd, dmask, bg, jnp.float32(1e-4),
            jnp.float32(1e-3), jnp.float32(0.0), jnp.int32(0))
    s, m = step(state, *args)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        s, m = step(state, *args)
    jax.block_until_ready(m["loss"])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    hw = "--hw" in sys.argv
    from jax.sharding import Mesh

    from __graft_entry__ import _tiny_scene
    from gsplat_tpu.capacity import probe_instance_capacity, round128
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.parallel.sharding import place_train_state
    from gsplat_tpu.train.step import init_train_state
    from gsplat_tpu.config import OptimizationConfig

    n = 262_144 if hw else 200_000
    width, height = (1920, 1072) if hw else (512, 512)
    params, alive, camera = _tiny_scene(
        n=n, width=width, height=height, sh_degree=3, capacity=n
    )
    holder = type("H", (), {"camera": camera})
    peak = probe_instance_capacity(params, alive, [holder])
    backend = "pallas" if hw else "jnp"
    # CPU: a small max_per_tile pins the jnp blend's cost (it pads every
    # tile to max_per_tile), so the full-gather-vs-band delta isolates the
    # per-row front-end (table build, cumsum, depth sort) the exchange cuts
    settings = make_render_settings(
        sh_degree=3, max_per_tile=2048 if hw else 256,
        instance_capacity=round128(int(1.1 * peak) + 128 * 16),
        backend=backend,
    )
    state = init_train_state(params, alive, num_images=1)
    gt = jnp.zeros((height, width, 3))

    if hw:
        mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("gauss", "tile"))
        t_plain = run(make_step("plain", mesh, settings, width, height, None),
                      state, camera, gt)
        state_m = place_train_state(mesh, state)
        t_pipe = run(make_step("pipe", mesh, settings, width, height, None),
                     state_m, camera, gt)
        print(json.dumps({
            "config": "hw mesh 1x1", "n": n, "plain_ms": round(t_plain, 2),
            "pipeline_ms": round(t_pipe, 2),
            "overhead_pct": round(100 * (t_pipe / t_plain - 1), 2),
        }), flush=True)

        # post-gather front-end scaling: the band exchange's whole point is
        # that the per-device binning front-end (table build, cumsum, expand,
        # wide sort -> TileBins) runs on the compacted G*C rows instead of
        # N_global. Time exactly that stage on-chip at both input sizes
        # (band fraction f ~ 1/T + rect_h/gy ~ 0.19 at 1080p, T=8).
        from gsplat_tpu.ops.binning import pack_bins
        from gsplat_tpu.ops.projection import preprocess
        from gsplat_tpu.render import grid_dims

        gx, gy = grid_dims(camera, 16)
        screen = jax.jit(
            lambda p, a: preprocess(p, a, camera, settings, gx, gy)
        )(params, alive)
        jax.block_until_ready(screen.depth)
        rows = {}
        for frac, tag in ((1.0, "full_gather"), (0.19, "band")):
            m = int(n * frac) // 128 * 128
            cap = round128(int(settings.instance_capacity * frac))
            sub = jax.tree.map(lambda x: x[:m], screen)
            f = jax.jit(lambda s: pack_bins(s, gx, gy, cap, 16, True))
            out = f(sub)
            jax.block_until_ready(out.tile_id)
            t0 = time.perf_counter()
            for _ in range(8):
                out = f(sub)
            jax.block_until_ready(out.tile_id)
            rows[tag] = {
                "rows_in": m, "capacity": cap,
                "ms": round((time.perf_counter() - t0) / 8 * 1e3, 2),
            }
        rows["config"] = "hw post-gather front-end"
        rows["speedup"] = round(
            rows["full_gather"]["ms"] / rows["band"]["ms"], 2
        )
        print(json.dumps(rows), flush=True)
        return

    from gsplat_tpu.capacity import probe_exchange_capacity

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("gauss", "tile"))
    state = place_train_state(mesh, state)
    t_full = run(make_step("pipe", mesh, settings, width, height, None),
                 state, camera, gt)
    epeak = probe_exchange_capacity(params, alive, [holder], 2, 4)
    exch = round128(int(1.3 * epeak))
    t_band = run(make_step("pipe", mesh, settings, width, height, exch),
                 state, camera, gt)
    print(json.dumps({
        "config": "cpu mesh 2x4", "n": n,
        "full_gather_ms": round(t_full, 2), "band_exchange_ms": round(t_band, 2),
        "exchange_capacity": exch, "post_gather_rows_full": n,
        "post_gather_rows_band": 2 * exch,
        "speedup": round(t_full / t_band, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
