#!/usr/bin/env python
"""Round-2 glue probes, part 2: scatter uniqueness, wide-payload sorts,
sorted segment reductions, stack/interleave costs. Run on the real TPU."""

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
    # REAL-PIPELINE WARMUP: fresh-process microbenchmarks report fake-fast
    # times on this image (see scripts/profile_stages.py) — run the actual
    # render pipeline first so subsequent micro timings are trustworthy.
    from __graft_entry__ import _tiny_scene
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.render import render
    import jax.numpy as jnp
    p_, a_, cam_ = _tiny_scene(n=65536, width=640, height=480, sh_degree=2, capacity=65536)
    st_ = make_render_settings(sh_degree=2, max_per_tile=2048, instance_capacity=1 << 18, backend="pallas")
    out_ = jax.jit(lambda p, a: render(cam_, p, a, st_, jnp.zeros(3)))(p_, a_)
    jax.block_until_ready(out_["render"])
    print("warmup done")
    N = 262_144
    K = 1_130_368
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # unique, sorted scatter destinations (the RLD run-start slots)
    counts = jax.random.randint(k1, (N,), 1, 8)
    start_slot = jnp.cumsum(counts) - counts
    start_slot = jnp.minimum(start_slot, K).astype(jnp.int32)
    delta8 = jax.random.normal(k2, (N, 8), jnp.float32)
    delta16 = jax.random.normal(k2, (N, 16), jnp.float32)

    print("=== scatter variants (N=262k rows -> (K+1, w)) ===")
    f = jax.jit(lambda d, s: jnp.zeros((K + 1, 8), jnp.float32).at[s].add(d, mode="drop"))
    t, _ = timeit(f, delta8, start_slot); print(f"scatter-add w8            {t*1e3:8.2f} ms")
    f = jax.jit(lambda d, s: jnp.zeros((K + 1, 8), jnp.float32).at[s].add(
        d, mode="drop", unique_indices=True))
    t, _ = timeit(f, delta8, start_slot); print(f"scatter-add w8 unique     {t*1e3:8.2f} ms")
    f = jax.jit(lambda d, s: jnp.zeros((K + 1, 8), jnp.float32).at[s].set(d, mode="drop"))
    t, _ = timeit(f, delta8, start_slot); print(f"scatter-set w8            {t*1e3:8.2f} ms")
    f = jax.jit(lambda d, s: jnp.zeros((K + 1, 8), jnp.float32).at[s].set(
        d, mode="drop", unique_indices=True, indices_are_sorted=True))
    t, _ = timeit(f, delta8, start_slot); print(f"scatter-set w8 uniq+sort  {t*1e3:8.2f} ms")
    f = jax.jit(lambda d, s: jnp.zeros((K + 1, 16), jnp.float32).at[s].add(
        d, mode="drop", unique_indices=True, indices_are_sorted=True))
    t, _ = timeit(f, delta16, start_slot); print(f"scatter-add w16 uniq+sort {t*1e3:8.2f} ms")
    f = jax.jit(lambda d, s: jnp.zeros((K + 1,), jnp.float32).at[s].add(
        d[:, 0], mode="drop", unique_indices=True, indices_are_sorted=True))
    t, _ = timeit(f, delta8, start_slot); print(f"scatter-add w1 uniq+sort  {t*1e3:8.2f} ms")

    print("=== cumsum over K ===")
    rows16 = jax.random.normal(k3, (K, 16), jnp.float32)
    f = jax.jit(lambda r: jnp.cumsum(r, axis=0))
    t, _ = timeit(f, rows16); print(f"cumsum (K,16) f32         {t*1e3:8.2f} ms")
    rows16i = (rows16 * 100).astype(jnp.int32)
    f = jax.jit(lambda r: jnp.cumsum(r, axis=0))
    t, _ = timeit(f, rows16i); print(f"cumsum (K,16) i32         {t*1e3:8.2f} ms")

    print("=== wide-payload sorts at K ===")
    tile_key = jax.random.randint(k1, (K,), 0, 8160).astype(jnp.int32)
    dbits = jax.random.randint(k2, (K,), 0, 1 << 30).astype(jnp.int32)
    gid = jax.random.randint(k3, (K,), 0, N).astype(jnp.int32)
    cols = jax.random.normal(k4, (K, 12), jnp.float32)

    def mk(nk, ncol, stable):
        keys = (tile_key, dbits, gid)[:nk]
        payload = tuple(cols[:, i] for i in range(ncol))
        f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=nk, is_stable=stable))
        t, _ = timeit(f, *(keys + payload))
        print(f"sort {nk}key+{ncol:2d}col stable={int(stable)}   {t*1e3:8.2f} ms")

    mk(2, 1, True)
    mk(2, 11, True)
    mk(3, 11, False)
    mk(2, 11, False)
    mk(2, 6, False)
    mk(2, 4, False)

    print("=== segment reduce (sorted vs unsorted ids) ===")
    rows10 = cols[:, :10]
    f = jax.jit(lambda r, g: jax.ops.segment_sum(r, g, num_segments=N))
    t, _ = timeit(f, rows10, gid); print(f"segment_sum w10 unsorted  {t*1e3:8.2f} ms")
    sgid = jnp.sort(gid)
    f = jax.jit(lambda r, g: jax.ops.segment_sum(r, g, num_segments=N,
                                                 indices_are_sorted=True))
    t, _ = timeit(f, rows10, sgid); print(f"segment_sum w10 sorted    {t*1e3:8.2f} ms")
    # sorted-run reduction: cumsum + boundary gather diff
    bounds = jnp.searchsorted(sgid, jnp.arange(N + 1, dtype=jnp.int32))
    def run_reduce(r, b):
        c = jnp.cumsum(r, axis=0)
        c = jnp.concatenate([jnp.zeros((1, r.shape[1]), r.dtype), c], axis=0)
        return c[b[1:]] - c[b[:-1]]
    f = jax.jit(run_reduce)
    t, _ = timeit(f, rows10, bounds); print(f"cumsum+bounds-diff w10    {t*1e3:8.2f} ms")

    print("=== assembling (16,K) from 10 sorted columns ===")
    ten = tuple(cols[:, i] for i in range(10))
    def stack10(*cs):
        return jnp.stack(cs + (jnp.zeros_like(cs[0]),) * 6, axis=0)
    f = jax.jit(stack10)
    t, _ = timeit(f, *ten); print(f"stack 10x(K,)->(16,K)     {t*1e3:8.2f} ms")

    print("=== compaction gather (live rows) ===")
    table = jax.random.normal(k4, (N, 16), jnp.float32)
    live_idx = jnp.sort(jax.random.permutation(k1, N)[: N // 2])
    f = jax.jit(lambda t_, i: t_[i])
    t, _ = timeit(f, table, live_idx); print(f"gather (N/2,16) sorted    {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
