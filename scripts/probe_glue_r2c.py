#!/usr/bin/env python
"""Round-2 glue probes, part 3: transposed seeding scatter + forward-fill
scan layouts for the fused pack_bins. Run on the real TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    # REAL-PIPELINE WARMUP (see scripts/profile_stages.py: fresh-process
    # microbenchmarks report fake-fast times on this image).
    from __graft_entry__ import _tiny_scene
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.render import render
    p_, a_, cam_ = _tiny_scene(n=65536, width=640, height=480, sh_degree=2, capacity=65536)
    st_ = make_render_settings(sh_degree=2, max_per_tile=2048, instance_capacity=1 << 18, backend="jnp")
    out_ = jax.jit(lambda p, a: render(cam_, p, a, st_, jnp.zeros(3)))(p_, a_)
    jax.block_until_ready(out_["render"])
    print("warmup done")

    N = 262_144
    K = 1_130_368
    W = 17
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    counts = jax.random.randint(k1, (N,), 1, 8)
    start_slot = jnp.minimum(jnp.cumsum(counts) - counts, K).astype(jnp.int32)
    tblT = jax.random.normal(k2, (W, N), jnp.float32)
    tbl = tblT.T.copy()

    print("=== seeding scatter layouts ===")
    f = jax.jit(lambda d, s: jnp.zeros((W, K + 1), jnp.float32).at[:, s].set(
        d, mode="drop", unique_indices=True, indices_are_sorted=True))
    t, seededT = timeit(f, tblT, start_slot); print(f"scatter-set T (W,N)->(W,K)  {t*1e3:8.2f} ms")
    f = jax.jit(lambda d, s: jnp.zeros((W, K + 1), jnp.float32).at[:, s].add(
        d, mode="drop", unique_indices=True, indices_are_sorted=True))
    t, _ = timeit(f, tblT, start_slot); print(f"scatter-add T               {t*1e3:8.2f} ms")

    print("=== forward-fill scan layouts ===")
    seeded = seededT[:, :K].T.copy()  # (K, W)
    flag = seeded[:, 0] != 0.0

    def ffill_rows(flag, vals):
        def op(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb[:, None], vb, va)
        return jax.lax.associative_scan(op, (flag, vals), axis=0)[1]

    f = jax.jit(ffill_rows)
    t, _ = timeit(f, flag, seeded); print(f"ffill assoc (K,W) axis0     {t*1e3:8.2f} ms")

    def ffill_T(flag, valsT):
        def op(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb[None, :], vb, va)
        return jax.lax.associative_scan(op, (flag, valsT), axis=-1)[1]

    f = jax.jit(ffill_T)
    t, _ = timeit(f, flag, seededT[:, :K]); print(f"ffill assoc (W,K) axis1     {t*1e3:8.2f} ms")

    f = jax.jit(lambda x: jnp.cumsum(x, axis=0))
    t, _ = timeit(f, seeded); print(f"cumsum (K,W) axis0          {t*1e3:8.2f} ms")
    f = jax.jit(lambda x: jnp.cumsum(x, axis=1))
    t, _ = timeit(f, seededT[:, :K]); print(f"cumsum (W,K) axis1          {t*1e3:8.2f} ms")
    f = jax.jit(lambda x: x.T.copy())
    t, _ = timeit(f, seededT[:, :K]); print(f"transpose (W,K)->(K,W)      {t*1e3:8.2f} ms")

    print("=== fused seeding+ffill+sort end-to-end sketch ===")
    tile_key = jax.random.randint(k1, (K,), 0, 8160).astype(jnp.int32)
    dkey = jax.random.randint(k2, (K,), 0, 1 << 30).astype(jnp.int32)
    gid3 = jax.random.randint(k1, (K,), 0, N).astype(jnp.int32)
    cols = jax.random.normal(k2, (K, 10), jnp.float32)

    def full(tblT, s, tk, dk, g):
        seededT = jnp.zeros((W, K + 1), jnp.float32).at[:, s].set(
            tblT, mode="drop", unique_indices=True, indices_are_sorted=True)[:, :K]
        fl = seededT[0] != 0.0
        rows = ffill_T(fl, seededT)
        ops = jax.lax.sort((tk, dk, g) + tuple(rows[c] for c in range(6, 16)),
                           num_keys=3, is_stable=False)
        return jnp.stack(ops[3:] + (jnp.zeros((K,), jnp.float32),) * 6, axis=0)

    f = jax.jit(full)
    t, _ = timeit(f, tblT, start_slot, tile_key, dkey, gid3)
    print(f"seed+ffill+sort+stack       {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
