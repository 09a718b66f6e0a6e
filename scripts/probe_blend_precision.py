#!/usr/bin/env python
"""Measure the fast-math headroom of the blend kernels' MXU contractions:
HIGHEST (parity default; multi-pass f32) vs DEFAULT (single-pass bf16 — the
round-2 precision bug's speed, now as an explicit question). Full fwd+bwd
at the garden point, same session. If the win is real (>5%), DEFAULT
becomes a certification candidate like the packet modes; if not, this
records the lever dead.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import _tiny_scene
from gsplat_tpu.capacity import probe_instance_capacity, round128
from gsplat_tpu.core.types import make_render_settings
from gsplat_tpu.render import render
import gsplat_tpu.ops.rasterize_pallas as rp


def measure(n=1_048_576, width=1920, height=1080, iters=6):
    params, alive, camera = _tiny_scene(
        n=n, width=width, height=height, sh_degree=3, capacity=n
    )
    holder = type("H", (), {"camera": camera})
    peak = probe_instance_capacity(params, alive, [holder])
    settings = make_render_settings(
        sh_degree=3, max_per_tile=2048, instance_capacity=round128(peak),
        backend="pallas", packet_dtype="hybrid",
    )

    out = {}
    for name, prec in (("highest", jax.lax.Precision.HIGHEST),
                       ("default", jax.lax.Precision.DEFAULT)):
        rp.BLEND_PRECISION = prec
        rp._make_blend_vjp.cache_clear()
        rp._make_oit_vjp.cache_clear()

        def loss_fn(params, alive):
            o = render(camera, params, alive, settings, jnp.zeros(3))
            return o["render"].mean() + 0.0 * o["invdepth"].mean()

        step = jax.jit(jax.grad(loss_fn))
        g = step(params, alive)
        jax.block_until_ready(g)
        t0 = time.perf_counter()
        for _ in range(iters):
            g = step(params, alive)
        jax.block_until_ready(g)
        out[name] = round((time.perf_counter() - t0) / iters * 1e3, 2)
    rp.BLEND_PRECISION = jax.lax.Precision.HIGHEST
    rp._make_blend_vjp.cache_clear()
    rp._make_oit_vjp.cache_clear()
    out["speedup"] = round(out["highest"] / out["default"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    measure()
