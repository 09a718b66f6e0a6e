#!/usr/bin/env python
"""Stage-by-stage wall-clock profile of the render pipeline on the current
backend. Identifies which stage bounds pixels/s (sort? gathers? kernel?
segment_sum in backward?)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    from __graft_entry__ import _tiny_scene
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.ops.binning import bin_gaussians, pack_bins
    from gsplat_tpu.ops.projection import preprocess
    from gsplat_tpu.ops.rasterize_pallas import blend_tiles_pallas
    from gsplat_tpu.render import grid_dims, render

    width, height, n = 1920, 1080, int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    params, alive, camera = _tiny_scene(n=n, width=width, height=height, sh_degree=3, capacity=n)
    # size the instance buffer like bench.py (capacity-proportional stages)
    from gsplat_tpu.capacity import probe_instance_capacity, round128

    cam_holder = type("CamHolder", (), {"camera": camera})
    peak = probe_instance_capacity(params, alive, [cam_holder])
    settings = make_render_settings(
        sh_degree=3, max_per_tile=2048, instance_capacity=round128(peak),
        backend="pallas",
    )
    print(f"instance capacity: {settings.instance_capacity}")
    gx, gy = grid_dims(camera, settings.tile)

    pre = jax.jit(lambda p, a: preprocess(p, a, camera, settings, gx, gy))
    t, screen = timeit(pre, params, alive)
    print(f"preprocess           {t*1e3:8.2f} ms")

    bins_f = jax.jit(lambda s: pack_bins(s, gx, gy, settings.instance_capacity))
    t, bins = timeit(bins_f, screen)
    print(f"pack_bins (expand+sort)  {t*1e3:8.2f} ms   instances={int(bins.num_instances)} overflow={int(bins.overflow)}")

    legacy_f = jax.jit(lambda s: bin_gaussians(s, gx, gy, settings.instance_capacity))
    t, _ = timeit(legacy_f, screen)
    print(f"bin_gaussians (legacy)   {t*1e3:8.2f} ms")

    fwd = jax.jit(lambda s, b: blend_tiles_pallas(s, b, gx, gy, settings.tile))
    t, _ = timeit(fwd, screen, bins)
    print(f"blend fwd kernel         {t*1e3:8.2f} ms")

    full_f = jax.jit(lambda p, a: render(camera, p, a, settings, jnp.zeros(3))["render"].mean())
    t, _ = timeit(full_f, params, alive)
    print(f"full forward         {t*1e3:8.2f} ms")

    grad_f = jax.jit(jax.grad(lambda p, a: render(camera, p, a, settings, jnp.zeros(3))["render"].mean()))
    t, _ = timeit(grad_f, params, alive)
    print(f"full fwd+bwd         {t*1e3:8.2f} ms   -> {width*height/t/1e6:.2f} Mpix/s")

    if "--micro" not in sys.argv:
        return

    # ---- in-pipeline micro-attribution of the glue primitives (run AFTER the
    # real pipeline above: fresh-process microbenchmarks report fake-fast
    # times on this image) ----
    k = settings.instance_capacity
    n_gauss = params.xyz.shape[0]
    gid = bins.gauss_id
    key = jax.random.PRNGKey(0)
    table16 = jax.random.normal(key, (n_gauss, 16), jnp.float32)
    rows16 = jax.random.normal(key, (k, 16), jnp.float32)
    rows8 = rows16[:, :8]
    tile_key = bins.tile_id
    iota_n = jnp.arange(n_gauss, dtype=jnp.int32)
    depth = jax.random.uniform(key, (n_gauss,), jnp.float32)
    scat_idx = jnp.sort(jax.random.randint(key, (n_gauss,), 0, k))

    cases = {
        "row-gather (K,16)": jax.jit(lambda g: table16[g]),
        "segment_sum (K,16)->N": jax.jit(
            lambda r, g: jax.ops.segment_sum(r, g, num_segments=n_gauss)
        ),
        "inst sort key+1col": jax.jit(
            lambda tk, g: jax.lax.sort((tk, g), num_keys=1, is_stable=True)
        ),
        "inst sort key+16col": jax.jit(
            lambda tk, r: jax.lax.sort(
                (tk,) + tuple(r[:, i] for i in range(16)), num_keys=1, is_stable=True
            )
        ),
        "depth sort (N)": jax.jit(
            lambda d, i: jax.lax.sort((d, i), num_keys=1, is_stable=True)
        ),
        "cumsum (K,8)": jax.jit(lambda r: jnp.cumsum(r, axis=0)),
        "delta-scatter (N)->(K,8)": jax.jit(
            lambda r, s: jnp.zeros((k + 1, 8), jnp.float32).at[s].add(r, mode="drop")
        ),
        "transpose (K,16)->(16,K)": jax.jit(lambda r: r.T.copy()),
    }
    argmap = {
        "row-gather (K,16)": (gid,),
        "segment_sum (K,16)->N": (rows16, gid),
        "inst sort key+1col": (tile_key, gid),
        "inst sort key+16col": (tile_key, rows16),
        "depth sort (N)": (depth, iota_n),
        "cumsum (K,8)": (rows8,),
        "delta-scatter (N)->(K,8)": (table16[:, :8], scat_idx),
        "transpose (K,16)->(16,K)": (rows16,),
    }
    for name, fn in cases.items():
        t, _ = timeit(fn, *argmap[name], iters=5)
        print(f"micro {name:<28} {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
