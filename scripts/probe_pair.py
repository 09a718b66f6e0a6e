#!/usr/bin/env python
"""A/B measure tile pairing (rasterize_pallas.TILES_PER_STEP) on hardware.

Round-3 question: the backward-blend ablation showed ~6-10ms of per-tile
loop/DMA skeleton and isolated-op microbenches 5-25x cheaper than their
in-kernel share — if the kernels are issue/latency-bound rather than
VPU-throughput-bound, blending two adjacent tiles per grid step (512
sublanes, half the chunk-loop trips) should recover real time. If they are
throughput-bound, pairing is a wash. Measure, don't estimate.

Fake-fast guard: the axon tunnel intermittently reports ~0.1ms for a
~100ms step (deferred execution slipping past block_until_ready). Every
timing loop here ends by pulling one gradient leaf to host (a real byte
transfer cannot be deferred), and any reading faster than a physical floor
(the sort alone is >5ms at these scales) is re-measured.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import gsplat_tpu.ops.rasterize_pallas as rp

FLOOR_MS = 5.0  # no full fwd+bwd step at these scales can beat the sort alone


def build(n, width=1920, height=1080):
    from gsplat_tpu.capacity import probe_instance_capacity, round128
    from gsplat_tpu.core.types import make_render_settings
    from __graft_entry__ import _tiny_scene

    params, alive, camera = _tiny_scene(
        n=n, width=width, height=height, sh_degree=3, capacity=n
    )
    cam_holder = type("CamHolder", (), {"camera": camera})
    peak = probe_instance_capacity(params, alive, [cam_holder])
    settings = make_render_settings(
        sh_degree=3,
        max_per_tile=2048,
        instance_capacity=round128(peak),
        backend="pallas",
    )
    return params, alive, camera, settings, int(peak)


def time_step(params, alive, camera, settings, pair, iters=8):
    from gsplat_tpu.render import render

    rp.TILES_PER_STEP = pair

    def loss_fn(params, alive):
        out = render(camera, params, alive, settings, jnp.zeros(3))
        return out["render"].mean() + 0.0 * out["invdepth"].mean()

    step = jax.jit(jax.grad(loss_fn))
    g = step(params, alive)
    # force real execution through the relay: a host byte transfer cannot be
    # deferred the way block_until_ready sometimes is
    float(np.asarray(jax.tree_util.tree_leaves(g)[0]).ravel()[0])

    for attempt in range(4):
        t0 = time.perf_counter()
        for _ in range(iters):
            g = step(params, alive)
        float(np.asarray(jax.tree_util.tree_leaves(g)[0]).ravel()[0])
        ms = (time.perf_counter() - t0) / iters * 1e3
        if ms >= FLOOR_MS:
            return ms
        print(json.dumps({"discarded_fake_fast_ms": round(ms, 3), "pair": pair}),
              flush=True)
        time.sleep(2.0)
    raise RuntimeError(
        f"fake-fast readings persisted through 4 attempts (last {ms:.3f}ms < "
        f"{FLOOR_MS}ms floor) — do not trust this session's timings"
    )


def run(n, pairs=(1, 2, 4)):
    params, alive, camera, settings, peak = build(n)
    out = {}
    for pair in pairs:
        ms = time_step(params, alive, camera, settings, pair)
        out[pair] = ms
        print(
            json.dumps(
                {
                    "n_gauss": n,
                    "tiles_per_step": pair,
                    "fwd_bwd_ms": round(ms, 2),
                    "pixels_per_s": round(1920 * 1080 / ms * 1e3, 1),
                    "instances": peak,
                }
            ),
            flush=True,
        )
    if 1 in out and 2 in out:
        print(json.dumps({"n_gauss": n, "pair2_speedup": round(out[1] / out[2], 3)}),
              flush=True)
    rp.TILES_PER_STEP = 1
    return out


if __name__ == "__main__":
    assert jax.devices()[0].platform != "cpu", "hardware probe"
    run(262_144)
    run(1_048_576)
