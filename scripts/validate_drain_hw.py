#!/usr/bin/env python
"""On-chip check of the round-5 protocol changes (fast drain + unroll).

The CPU interpreter executes DMAs synchronously, so the early-stop fast
drain's semaphore/cursor bookkeeping (skipped chunks are never issued;
the next tile's fetch jumps the issue cursor) is only really exercised on
hardware. This builds a scene engineered to SATURATE (huge opaque front
splats -> early stop with a long drained tail in most tiles) and compares
the Pallas kernels against the jnp oracle on the REAL device, at unroll
1, 2 and 4.

Exit 0 = all configurations match the oracle.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

OUT_TOL = 1e-4
GRAD_TOL = 1e-4


def main():
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.ops import rasterize_pallas as rp
    from gsplat_tpu.ops.binning import bin_gaussians, pack_bins
    from gsplat_tpu.ops.projection import preprocess
    from gsplat_tpu.ops.rasterize_jnp import blend_tiles_jnp
    from gsplat_tpu.render import grid_dims
    from tests.oracle.reference_math import make_test_scene
    from tests.test_forward_vs_oracle import scene_to_inputs

    print(f"devices: {jax.devices()}")
    sc = make_test_scene(
        np.random.default_rng(11), n=6000, width=256, height=192, sh_degree=2
    )
    params, camera, alive = scene_to_inputs(sc)
    # saturate: crank opacity so the front instances absorb everything and
    # the early stop fires with a LONG remaining tail (the fast-drain path)
    params = params.replace(opacity=params.opacity + 6.0)
    settings = make_render_settings(
        sh_degree=2, max_per_tile=4096, instance_capacity=1 << 18,
        backend="pallas",
    )
    gx, gy = grid_dims(camera, 16)
    screen = jax.jit(
        lambda p, a: preprocess(p, a, camera, settings, gx, gy)
    )(params, alive)
    bins = jax.jit(
        lambda s: pack_bins(s, gx, gy, settings.instance_capacity, 16, True)
    )(screen)
    oj_bins = jax.jit(
        lambda s: bin_gaussians(s, gx, gy, settings.instance_capacity, 16, True)
    )(screen)
    oj = jax.jit(
        lambda s: blend_tiles_jnp(s, oj_bins, gx, gy, 16, 4096, 128)
    )(screen)

    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.random((gx * gy, 256, 3)), jnp.float32)

    def loss_of(fn):
        def f(mean2d):
            s2 = screen.replace(mean2d=mean2d)
            out = fn(s2)
            return jnp.sum((out.color - tgt) ** 2) + jnp.sum(out.final_t) * 0.3
        return f

    gj = jax.jit(jax.grad(loss_of(
        lambda s: blend_tiles_jnp(s, oj_bins, gx, gy, 16, 4096, 128)
    )))(screen.mean2d)

    failures = 0
    for unroll in (1, 2, 4):
        rp.FWD_UNROLL = unroll
        rp.BWD_UNROLL = unroll
        rp._make_blend_vjp.cache_clear()
        op = jax.jit(
            lambda s: rp.blend_tiles_pallas(s, bins, gx, gy, 16)
        )(screen)
        dc = float(jnp.abs(op.color - oj.color).max())
        dt = float(jnp.abs(op.final_t - oj.final_t).max())
        gp = jax.jit(jax.grad(loss_of(
            lambda s: rp.blend_tiles_pallas(s, bins, gx, gy, 16)
        )))(screen.mean2d)
        gscale = float(jnp.abs(gj).max()) + 1e-8
        dg = float(jnp.abs(gp - gj).max()) / gscale
        ok = dc < OUT_TOL and dt < OUT_TOL and dg < GRAD_TOL
        failures += 0 if ok else 1
        print(f"unroll={unroll}: color {dc:.2e} final_t {dt:.2e} "
              f"d_mean2d rel {dg:.2e} -> {'OK' if ok else 'FAIL'}",
              flush=True)
    rp.FWD_UNROLL = 1
    rp.BWD_UNROLL = 1
    rp._make_blend_vjp.cache_clear()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
