#!/usr/bin/env python
"""Round-5 probe: does Mosaic issue PACKED bf16 vector arithmetic at double
rate on the v5e VPU? (Verdict item 2b — the serving-path question: if bf16
elementwise math ran 2x, a bf16 forward blend could halve the VPU time.)

Method: one Pallas kernel per dtype running K iterations of the forward
blend's characteristic op mix (mul/add/compare/select/exp) on a (256,128)
block resident in VMEM — no DMA in the loop, so the measured ratio is pure
ALU issue. The bf16 kernel uses bf16 INPUTS AND bf16 ARITHMETIC (no f32
upcast); if the VPU packs 2 bf16 lanes per f32 lane the bf16 kernel runs
~2x faster; if it upconverts (the TPU tradition) it runs ~1x (or slower,
paying convert ops).

Run AFTER a warmup anchor (axon fake-fast trap): the script renders one
real frame first.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 2000  # inner iterations; ~60 ops each -> ~120k vector ops per call


def make_kernel(dtype):
    def kernel(x_ref, o_ref):
        x = x_ref[...]
        one = jnp.ones((), dtype)
        half = jnp.asarray(0.5, dtype)

        def body(i, acc):
            x2 = acc * half + one          # fma-ish
            p = -(x2 * x2) * half          # quadratic
            g = jnp.exp(p)                 # transcendental (blend's exp)
            a = jnp.minimum(x2 * g, one)   # alpha clamp
            # gating compares run in f32 on every path: Mosaic rejects
            # cmpf on PACKED bf16 vectors outright ("Target does not
            # support this comparison", probed 2026-08-21), so a packed
            # bf16 blend would have to upcast for its gates regardless —
            # the probe now measures exactly that op mix.
            pf = p.astype(jnp.float32)
            af = a.astype(jnp.float32)
            keep = (pf <= 0) & (af >= jnp.float32(1e-4))
            a = jnp.where(keep, a, jnp.zeros((), dtype))
            return acc + a * half

        o_ref[...] = jax.lax.fori_loop(0, K, body, x)

    return kernel


def run(dtype, shape=(256, 128), iters=10):
    x = jnp.asarray(np.random.default_rng(0).random(shape), dtype)
    f = pl.pallas_call(
        make_kernel(dtype),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    g = jax.jit(f)
    out = g(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = g(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    # warmup anchor: one real render so the session clock/power state is hot
    from __graft_entry__ import _tiny_scene
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.render import render

    params, alive, camera = _tiny_scene(n=65536, width=640, height=480)
    settings = make_render_settings(
        sh_degree=3, max_per_tile=2048, instance_capacity=1 << 18,
        backend="pallas",
    )
    img = jax.jit(
        lambda p, a: render(camera, p, a, settings, jnp.zeros(3))["render"]
    )(params, alive)
    jax.block_until_ready(img)
    print("anchor render done", flush=True)

    res = {}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        t = run(dt)
        res[name] = round(t * 1e3, 3)
        print(f"{name} (256,128) x {K} it: {t*1e3:.3f} ms", flush=True)
    # double-width variant: same BYTES for bf16 as f32 above
    for name, dt, shape in (
        ("f32_512", jnp.float32, (512, 128)),
        ("bf16_512", jnp.bfloat16, (512, 128)),
    ):
        t = run(dt, shape)
        res[name] = round(t * 1e3, 3)
        print(f"{name} {shape} x {K} it: {t*1e3:.3f} ms", flush=True)
    res["bf16_speedup_same_shape"] = round(res["f32"] / res["bf16"], 3)
    res["bf16_speedup_512"] = round(res["f32_512"] / res["bf16_512"], 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
