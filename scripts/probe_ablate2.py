#!/usr/bin/env python
"""Skeleton-cost probe: the real kernels' grid/fetch/while/emit machinery
with the chunk math genuinely dead (constant-zero emissions), vs full."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

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


def _skel_fwd_kernel(grid_x, tile, start_ref, end_ref, inst_ref, out_ref,
                     scr, sems, cur):
    t = pl.program_id(0)
    num_tiles = pl.num_programs(0)
    s = start_ref[t]
    e = end_ref[t]
    base = s // rp.CHUNK
    nch = jnp.where(e > s, pl.cdiv(e, rp.CHUNK) - base, 0)
    nctotal = pl.cdiv(end_ref[num_tiles - 1], rp.CHUNK)
    init, fetch = rp._read_protocol(inst_ref, scr, sems, cur, nctotal)
    init(t)

    def body(ci, acc):
        blk = fetch(base + ci)
        return acc + blk[0:1, 0:1].astype(jnp.float32) * 1e-30

    acc = jax.lax.fori_loop(0, nch, body, jnp.zeros((1, 1), jnp.float32))
    out_ref[0, :, :] = jnp.zeros((rp.PPT, 8), jnp.float32) + acc[0, 0]


def _skel_bwd_kernel(grid_x, tile, start_ref, end_ref, inst_ref, fwd_ref,
                     dout_ref, dinst_ref, scr, grad_scr, carry_scr, sems,
                     out_sems, cur):
    t = pl.program_id(0)
    num_tiles = pl.num_programs(0)
    s = start_ref[t]
    e = end_ref[t]
    base = s // rp.CHUNK
    nch = jnp.where(e > s, pl.cdiv(e, rp.CHUNK) - base, 0)
    total = end_ref[num_tiles - 1]
    nctotal = pl.cdiv(total, rp.CHUNK)
    init, fetch = rp._read_protocol(inst_ref, scr, sems, cur, nctotal)
    init(t)

    @pl.when(t == 0)
    def _():
        cur[rp._PEND] = 0
        cur[rp._WCNT] = 0

    emit, wr_wait = rp._make_emit(
        nch, e, total, dinst_ref, grad_scr, carry_scr, out_sems, cur
    )
    zeros = jnp.zeros((rp.N_ROWS, rp.CHUNK), jnp.float32)

    def body(ci, acc):
        blk = fetch(base + ci)
        emit(ci, base + ci, zeros + acc[0, 0])
        return acc + blk[0:1, 0:1].astype(jnp.float32) * 1e-30

    jax.lax.fori_loop(0, nch, body, jnp.zeros((1, 1), jnp.float32))

    @pl.when(t == num_tiles - 1)
    def _():
        w = cur[rp._WCNT]
        for j in range(1, rp._WBUF + 1):
            @pl.when(w >= j)
            def _(j=j):
                wr_wait((w - j) % rp._WBUF)


def run_skel_fwd(inst_t, tile_start, tile_end, grid_x, grid_y, tile):
    num_tiles = grid_x * grid_y
    kernel = functools.partial(_skel_fwd_kernel, grid_x, tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, rp.PPT, 8), lambda t, s, e: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rp._NBUF, rp.N_ROWS, rp.CHUNK), inst_t.dtype),
            pltpu.SemaphoreType.DMA((rp._NBUF,)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, rp.PPT, 8), jnp.float32),
    )(tile_start, tile_end, inst_t)


def run_skel_bwd(inst_t, tile_start, tile_end, fwd_out, dout, grid_x, grid_y, tile):
    num_tiles = grid_x * grid_y
    k_pad = inst_t.shape[1]
    kernel = functools.partial(_skel_bwd_kernel, grid_x, tile)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, rp.PPT, 8), lambda t, s, e: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp.PPT, 8), lambda t, s, e: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((rp._NBUF, rp.N_ROWS, rp.CHUNK), inst_t.dtype),
            pltpu.VMEM((rp._WBUF, rp.N_ROWS, rp.CHUNK), jnp.float32),
            pltpu.VMEM((rp.N_ROWS, rp.CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((rp._NBUF,)),
            pltpu.SemaphoreType.DMA((rp._WBUF,)),
            pltpu.SMEM((4 + rp._WBUF,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rp.N_ROWS, k_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_start, tile_end, inst_t, fwd_out, dout)


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
    peak = probe_instance_capacity(params, alive, [type("C", (), {"camera": camera})])
    settings = make_render_settings(sh_degree=3, max_per_tile=2048,
                                    instance_capacity=round128(peak), backend="pallas")
    gx, gy = grid_dims(camera, settings.tile)

    # heavyweight warmup: the axon tunnel reports fake-fast times until a
    # full real pipeline has run REPEATEDLY (verify skill gotcha); anchor
    # on the known full-step cost before trusting any microbench number
    def loss_fn(p, a):
        o = render(camera, p, a, settings, jnp.zeros(3))
        return o["render"].mean() + 0.0 * o["invdepth"].mean()

    step = jax.jit(jax.value_and_grad(loss_fn))
    t_anchor = timeit(step, params, alive, iters=5)
    print(f"ANCHOR full fwd+bwd {t_anchor*1e3:7.2f} ms (must be ~115-125; "
          "if tens of us, this session is fake-fast and numbers are junk)")
    screen = jax.jit(lambda p, a: preprocess(p, a, camera, settings, gx, gy))(params, alive)
    bins = jax.jit(lambda s: pack_bins(s, gx, gy, settings.instance_capacity))(screen)
    num_tiles = gx * gy
    dout = jnp.ones((num_tiles, 256, 8), jnp.float32) / (width * height)

    t = timeit(jax.jit(lambda i, s, e: rp._run_forward(i, s, e, gx, gy, 16)),
               bins.inst_t, bins.tile_start, bins.tile_end)
    print(f"fwd full       {t*1e3:7.2f} ms")
    t = timeit(jax.jit(lambda i, s, e: run_skel_fwd(i, s, e, gx, gy, 16)),
               bins.inst_t, bins.tile_start, bins.tile_end)
    print(f"fwd skeleton   {t*1e3:7.2f} ms   (fetch + fori loop only)")
    fwd_out = jax.jit(lambda i, s, e: rp._run_forward(i, s, e, gx, gy, 16))(
        bins.inst_t, bins.tile_start, bins.tile_end)
    t = timeit(jax.jit(lambda i, s, e, f, d: rp._run_backward(i, s, e, f, d, gx, gy, 16)),
               bins.inst_t, bins.tile_start, bins.tile_end, fwd_out, dout)
    print(f"bwd full       {t*1e3:7.2f} ms")
    t = timeit(jax.jit(lambda i, s, e, f, d: run_skel_bwd(i, s, e, f, d, gx, gy, 16)),
               bins.inst_t, bins.tile_start, bins.tile_end, fwd_out, dout)
    print(f"bwd skeleton   {t*1e3:7.2f} ms   (fetch + emit-zeros + fori loop)")


if __name__ == "__main__":
    main()
