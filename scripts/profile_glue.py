#!/usr/bin/env python
"""Attribute the non-kernel time inside the differentiable render.

Times, in one process (fresh-process microbenchmarks lie on this image —
see the gather/scatter notes in README): the pack row-gather, its
transpose, the backward segment_sum, the fwd/bwd pallas calls, and the
full fwd / fwd+bwd pipelines, so glue = full - sum(parts) is visible.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10, warmup=2):
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
    from gsplat_tpu.capacity import probe_instance_capacity, round128
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.ops.binning import bin_gaussians
    from gsplat_tpu.ops.projection import preprocess
    from gsplat_tpu.ops import rasterize_pallas as rp
    from gsplat_tpu.render import grid_dims, render

    width, height, n = 1920, 1080, 262_144
    params, alive, camera = _tiny_scene(n=n, width=width, height=height, sh_degree=3, capacity=n)
    cam_holder = type("H", (), {"camera": camera})
    peak = probe_instance_capacity(params, alive, [cam_holder])
    cap = round128(peak)
    settings = make_render_settings(
        sh_degree=3, max_per_tile=2048, instance_capacity=cap, backend="pallas"
    )
    gx, gy = grid_dims(camera, settings.tile)
    num_tiles = gx * gy
    print(f"instances={peak} capacity={cap} tiles={num_tiles}")

    screen = jax.jit(lambda p, a: preprocess(p, a, camera, settings, gx, gy))(params, alive)
    bins = jax.jit(lambda s: bin_gaussians(s, gx, gy, cap))(screen)
    jax.block_until_ready((screen, bins))

    k = cap
    k_pad = rp._round_up(k, rp.CHUNK)
    invz = 1.0 / jnp.maximum(screen.depth, 0.2)

    def table_of(s, iz):
        return jnp.concatenate(
            [s.mean2d, s.conic, s.opacity[:, None], s.rgb, iz[:, None],
             jnp.zeros((s.mean2d.shape[0], rp.N_ROWS - 10), jnp.float32)], axis=1)

    tbl_f = jax.jit(table_of)
    t, table = timeit(tbl_f, screen, invz)
    print(f"table concat (N,16)        {t*1e3:8.2f} ms")

    gather_f = jax.jit(lambda tb, gid: tb[gid])
    t, inst = timeit(gather_f, table, bins.gauss_id)
    print(f"row gather (K,16)          {t*1e3:8.2f} ms   ({t/k*1e9:.1f} ns/row)")

    tr_f = jax.jit(lambda i: jnp.pad(i, ((0, k_pad - k), (0, 0))).T)
    t, inst_t = timeit(tr_f, inst)
    print(f"pad + transpose -> (16,K)  {t*1e3:8.2f} ms")

    fwd_f = jax.jit(lambda it: rp._run_forward(it, bins.tile_start, bins.tile_end, gx, gy, 16))
    t, fwd_out = timeit(fwd_f, inst_t)
    print(f"pallas fwd kernel          {t*1e3:8.2f} ms")

    dout = jnp.ones_like(fwd_out)
    bwd_f = jax.jit(lambda it, fo, do: rp._run_backward(it, bins.tile_start, bins.tile_end, fo, do, gx, gy, 16))
    t, dinst = timeit(bwd_f, inst_t, fwd_out, dout)
    print(f"pallas bwd kernel          {t*1e3:8.2f} ms")

    seg_f = jax.jit(lambda di, gid: jax.ops.segment_sum(di.T[:k], gid, num_segments=n))
    t, _ = timeit(seg_f, dinst, bins.gauss_id)
    print(f"dinst.T + segment_sum      {t*1e3:8.2f} ms")

    # whole pipelines
    full_f = jax.jit(lambda p, a: render(camera, p, a, settings, jnp.zeros(3))["render"].mean())
    t, _ = timeit(full_f, params, alive)
    print(f"FULL forward               {t*1e3:8.2f} ms")

    grad_f = jax.jit(jax.grad(lambda p, a: render(camera, p, a, settings, jnp.zeros(3))["render"].mean()))
    t, _ = timeit(grad_f, params, alive)
    print(f"FULL forward+backward      {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
