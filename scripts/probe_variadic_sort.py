#!/usr/bin/env python
"""Probe: is XLA:TPU's variadic sort (1 key + k payload columns) actually
fast, and correct? Decides whether the pack row-gather and the backward
segment_sum can be restructured as sort-carried payloads.

No real-pipeline warmup needed here: sorts don't hit the gather engine.
Measures with random keys and verifies output order/stability.
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
    k = 1 << 21
    num_tiles = 8160
    rng = np.random.default_rng(0)
    keys_np = rng.integers(0, num_tiles, k).astype(np.int32)
    keys = jnp.asarray(keys_np)
    gid = jnp.asarray(rng.integers(0, 262144, k).astype(np.int32))
    payload = jnp.asarray(rng.normal(0, 1, (k, 16)).astype(np.float32))

    s2 = jax.jit(lambda tk, g: jax.lax.sort((tk, g), num_keys=1, is_stable=True))
    t, out2 = timeit(s2, keys, gid)
    print(f"sort key+1col (stable)      {t*1e3:8.2f} ms")

    s2u = jax.jit(lambda tk, g: jax.lax.sort((tk, g), num_keys=1, is_stable=False))
    t, _ = timeit(s2u, keys, gid)
    print(f"sort key+1col (unstable)    {t*1e3:8.2f} ms")

    def sort17(tk, g, r):
        cols = tuple(r[:, i] for i in range(16))
        return jax.lax.sort((tk, g) + cols, num_keys=1, is_stable=True)

    s17 = jax.jit(sort17)
    t, out17 = timeit(s17, keys, gid, payload)
    print(f"sort key+17col (stable)     {t*1e3:8.2f} ms")

    # verify: key order and payload consistency
    k_sorted = np.asarray(out17[0])
    assert np.all(np.diff(k_sorted) >= 0), "keys not sorted!"
    # payload column 0 must travel with gid: rebuild pairs and compare sets
    g17 = np.asarray(out17[1])
    c0 = np.asarray(out17[2])
    # reference: stable argsort
    order = np.argsort(keys_np, kind="stable")
    assert np.array_equal(g17, np.asarray(gid)[order]), "gid mismatch (stability?)"
    assert np.array_equal(c0, np.asarray(payload)[order, 0]), "payload mismatch"
    print("sort key+17col verified correct + stable")

    # gather comparison at same K
    table = jnp.asarray(rng.normal(0, 1, (262144, 16)).astype(np.float32))
    ggather = jax.jit(lambda g: table[g])
    t, _ = timeit(ggather, gid)
    print(f"row-gather (K,16)           {t*1e3:8.2f} ms")

    # segment-sum comparison
    seg = jax.jit(lambda r, g: jax.ops.segment_sum(r, g, num_segments=262144))
    t, _ = timeit(seg, payload, gid)
    print(f"segment_sum (K,16)->N       {t*1e3:8.2f} ms")

    # sort-by-gid + cumsum + boundary-gather segmented reduction
    def seg_by_sort(r, g):
        cols = tuple(r[:, i] for i in range(16))
        out = jax.lax.sort((g,) + cols, num_keys=1, is_stable=False)
        gs = out[0]
        rs = jnp.stack(out[1:], axis=1)  # (K,16)
        cs = jnp.cumsum(rs, axis=0)
        # boundary rows: last slot of each gaussian's run
        bounds = jnp.searchsorted(gs, jnp.arange(262144 + 1, dtype=jnp.int32))
        padded = jnp.concatenate([jnp.zeros((1, 16), cs.dtype), cs], axis=0)
        ends = padded[bounds]  # (N+1,16) row gather
        return ends[1:] - ends[:-1]

    segs = jax.jit(seg_by_sort)
    t, outs = timeit(segs, payload, gid)
    print(f"seg-reduce via sort+cumsum  {t*1e3:8.2f} ms")
    ref = jax.jit(lambda r, g: jax.ops.segment_sum(r, g, num_segments=262144))(
        payload, gid
    )
    err = float(jnp.max(jnp.abs(outs - ref)))
    print(f"  max abs err vs segment_sum: {err:.2e}")


if __name__ == "__main__":
    main()
