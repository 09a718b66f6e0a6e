#!/usr/bin/env python
"""Ablation probe for the REAL backward blend kernel: compile variants with
one stage neutralized (so Mosaic dead-code-eliminates it) and difference
the timings. All variants run in one session; compare deltas, not absolutes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import gsplat_tpu.ops.rasterize_pallas as rp


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


ABLATE = {"mode": None}
_orig_chunk_blend = rp._chunk_blend
_orig_cumsum = rp._cumsum_lanes


def patched_chunk_blend(blk, px, py, t_raw, lo, hi):
    q = _orig_chunk_blend(blk, px, py, t_raw, lo, hi)
    if ABLATE["mode"] == "no_cumprod":
        # neutralize the transmittance recurrence: t_excl/w become t_raw-
        # shaped broadcasts; the cumprod chain is dead and DCE'd
        q = dict(q)
        q["t_excl"] = jnp.broadcast_to(t_raw, q["t_excl"].shape)
        q["w"] = q["alpha"] * t_raw
        q["alpha_eff"] = q["alpha"]
        q["blended"] = q["keep"]
        q["eff_prod"] = t_raw[:, 0:1] * 0.999
        q["t_raw_next"] = t_raw * 0.999
    return q


def patched_cumsum(x):
    if ABLATE["mode"] == "no_cumsum":
        return x  # prefix degenerates; the 7 doubling steps are DCE'd
    return _orig_cumsum(x)


def main():
    from __graft_entry__ import _tiny_scene
    from gsplat_tpu.capacity import probe_instance_capacity, round128
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.ops.binning import pack_bins
    from gsplat_tpu.ops.projection import preprocess
    from gsplat_tpu.render import grid_dims, render

    width, height, n = 1920, 1080, 262_144
    params, alive, camera = _tiny_scene(n=n, width=width, height=height,
                                        sh_degree=3, capacity=n)
    cam_holder = type("C", (), {"camera": camera})
    peak = probe_instance_capacity(params, alive, [cam_holder])
    settings = make_render_settings(sh_degree=3, max_per_tile=2048,
                                    instance_capacity=round128(peak),
                                    backend="pallas")
    gx, gy = grid_dims(camera, settings.tile)
    # warm the engine
    out = jax.jit(lambda p, a: render(camera, p, a, settings, jnp.zeros(3)))(params, alive)
    jax.block_until_ready(out["render"])

    screen = jax.jit(lambda p, a: preprocess(p, a, camera, settings, gx, gy))(params, alive)
    bins = jax.jit(lambda s: pack_bins(s, gx, gy, settings.instance_capacity))(screen)
    num_tiles = gx * gy
    dout = jnp.ones((num_tiles, 256, 8), jnp.float32) / (width * height)

    rp._chunk_blend = patched_chunk_blend
    rp._cumsum_lanes = patched_cumsum

    def fwd():
        return jax.jit(lambda i, s, e: rp._run_forward(i, s, e, gx, gy, 16))
    def bwd():
        return jax.jit(lambda i, s, e, f, d: rp._run_backward(i, s, e, f, d, gx, gy, 16))

    fwd_out = fwd()(bins.inst_t, bins.tile_start, bins.tile_end)

    for mode in (None, "no_cumsum", "no_cumprod"):
        ABLATE["mode"] = mode
        tf = timeit(fwd(), bins.inst_t, bins.tile_start, bins.tile_end)
        tb = timeit(bwd(), bins.inst_t, bins.tile_start, bins.tile_end, fwd_out, dout)
        print(f"ablate={str(mode):12s} fwd {tf*1e3:7.2f} ms   bwd {tb*1e3:7.2f} ms")

    # zero-gradient skeleton: emit writes zeros -> all grad math DCE'd,
    # leaving fetch/early-stop/emit protocol + chunk_blend loop carry
    ABLATE["mode"] = None
    import functools as ft
    orig_make_emit = rp._make_emit
    def zero_emit(nch, e, total, dinst_ref, grad_scr, carry_scr, out_sems, cur):
        emit, wr_wait = orig_make_emit(nch, e, total, dinst_ref, grad_scr,
                                       carry_scr, out_sems, cur)
        return (lambda ci, g, grads: emit(ci, g, grads * 0.0)), wr_wait
    rp._make_emit = zero_emit
    tb = timeit(bwd(), bins.inst_t, bins.tile_start, bins.tile_end, fwd_out, dout)
    print(f"bwd skeleton (grads zeroed)        bwd {tb*1e3:7.2f} ms")
    rp._make_emit = orig_make_emit


if __name__ == "__main__":
    main()
