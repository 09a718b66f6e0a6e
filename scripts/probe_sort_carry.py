#!/usr/bin/env python
"""In-pipeline probe: variadic sort carrying payload vs gather-after-sort,
with UNSORTED random keys (the --micro case fed an already-sorted tile_id,
and fresh-process micros on this image are fake-fast — so warm up with the
real pipeline first and randomize keys)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    # real-pipeline warmup (fresh-process micros lie on this image)
    from __graft_entry__ import _tiny_scene
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.render import render

    width, height, n = 1920, 1080, 262_144
    params, alive, camera = _tiny_scene(n=n, width=width, height=height, sh_degree=3, capacity=n)
    settings = make_render_settings(
        sh_degree=3, max_per_tile=2048, instance_capacity=1 << 21, backend="pallas"
    )
    full_f = jax.jit(lambda p, a: render(camera, p, a, settings, jnp.zeros(3))["render"].mean())
    t, _ = timeit(full_f, params, alive, iters=2)
    print(f"pipeline warmup           {t*1e3:8.2f} ms")

    k = 1 << 21
    num_tiles = 8160
    n_gauss = 262_144
    kk, kg, kp, kt = jax.random.split(jax.random.PRNGKey(0), 4)
    keys = jax.random.randint(kk, (k,), 0, num_tiles, jnp.int32)
    gid = jax.random.randint(kg, (k,), 0, n_gauss, jnp.int32)
    payload = jax.random.normal(kp, (k, 16), jnp.float32)
    table = jax.random.normal(kt, (n_gauss, 16), jnp.float32)

    s2 = jax.jit(lambda tk, g: jax.lax.sort((tk, g), num_keys=1, is_stable=True))
    t, _ = timeit(s2, keys, gid)
    print(f"sort key+1col             {t*1e3:8.2f} ms")

    def sort17(tk, g, r):
        cols = tuple(r[:, i] for i in range(16))
        return jax.lax.sort((tk, g) + cols, num_keys=1, is_stable=True)

    s17 = jax.jit(sort17)
    t, out17 = timeit(s17, keys, gid, payload)
    print(f"sort key+17col            {t*1e3:8.2f} ms")
    assert bool(jnp.all(jnp.diff(out17[0]) >= 0)), "not sorted!"

    gath = jax.jit(lambda g: table[g])
    t, _ = timeit(gath, gid)
    print(f"row-gather (K,16)         {t*1e3:8.2f} ms")

    # sort+gather composite (current pack path shape)
    sg = jax.jit(lambda tk, g: table[jax.lax.sort((tk, g), num_keys=1, is_stable=True)[1]])
    t, _ = timeit(sg, keys, gid)
    print(f"sort2 + gather composite  {t*1e3:8.2f} ms")

    # segment-sum vs sort-based segmented reduction
    seg = jax.jit(lambda r, g: jax.ops.segment_sum(r, g, num_segments=n_gauss))
    t, ref = timeit(seg, payload, gid)
    print(f"segment_sum (K,16)->N     {t*1e3:8.2f} ms")

    def seg_by_sort(r, g):
        out = jax.lax.sort((g,) + tuple(r[:, i] for i in range(16)), num_keys=1)
        gs = out[0]
        rs = jnp.stack(out[1:], axis=1)  # (K,16)
        # doubling segmented inclusive scan (exact reassociated sums)
        seg_start = jnp.concatenate([jnp.ones((1,), bool), gs[1:] != gs[:-1]])
        run = jnp.cumsum(seg_start.astype(jnp.int32)) - 1  # run id per slot
        pos = jnp.arange(k, dtype=jnp.int32)
        acc = rs
        s = 1
        while s < k:
            shifted = jnp.concatenate([jnp.zeros((s, 16), rs.dtype), acc[:-s]], axis=0)
            same = jnp.concatenate([jnp.zeros((s,), bool), run[s:] == run[:-s]])
            acc = acc + jnp.where(same[:, None], shifted, 0.0)
            s *= 2
        bounds = jnp.searchsorted(gs, jnp.arange(1, n_gauss + 1, dtype=jnp.int32), side="left")
        idx = jnp.clip(bounds - 1, 0, k - 1)
        ends = acc[idx]  # (N,16) row gather
        has = bounds > jnp.searchsorted(gs, jnp.arange(n_gauss, dtype=jnp.int32), side="left")
        return jnp.where(has[:, None], ends, 0.0)

    segs = jax.jit(seg_by_sort)
    t, outs = timeit(segs, payload, gid)
    err = float(jnp.max(jnp.abs(outs - ref)))
    print(f"seg-reduce sort+dblscan   {t*1e3:8.2f} ms   max err {err:.2e}")


if __name__ == "__main__":
    main()
