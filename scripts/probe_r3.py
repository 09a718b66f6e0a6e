#!/usr/bin/env python
"""Round-3 attribution probe: exact cost of each fwd+bwd stage at the bench
config (262k gaussians, 1080p, ~1.13M instances), plus the candidate
replacements for the two scalar-engine stages (sort payload variants,
scatter-add variants). Run AFTER warmup (a real pipeline runs first)."""

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
    from gsplat_tpu.ops.binning import pack_bins, _expand_instances
    from gsplat_tpu.ops.projection import preprocess
    from gsplat_tpu.ops.rasterize_pallas import (
        _run_backward, _run_forward, blend_tiles_pallas, N_ROWS,
    )
    from gsplat_tpu.render import grid_dims, render

    width, height, n = 1920, 1080, 262_144
    params, alive, camera = _tiny_scene(n=n, width=width, height=height, sh_degree=3, capacity=n)
    cam_holder = type("CamHolder", (), {"camera": camera})
    peak = probe_instance_capacity(params, alive, [cam_holder])
    settings = make_render_settings(
        sh_degree=3, max_per_tile=2048, instance_capacity=round128(peak),
        backend="pallas",
    )
    gx, gy = grid_dims(camera, settings.tile)
    num_tiles = gx * gy
    cap = settings.instance_capacity
    print(f"capacity={cap} tiles={num_tiles}")

    # ---- warm the engine with the real full pipeline
    def loss_fn(p, a):
        out = render(camera, p, a, settings, jnp.zeros(3))
        return out["render"].mean() + 0.0 * out["invdepth"].mean()

    step = jax.jit(jax.value_and_grad(loss_fn))
    t, _ = timeit(step, params, alive, iters=5)
    full_ms = t * 1e3
    print(f"FULL fwd+bwd             {full_ms:8.2f} ms  -> {width*height/t/1e6:.2f} Mpix/s")

    pre = jax.jit(lambda p, a: preprocess(p, a, camera, settings, gx, gy))
    t, screen = timeit(pre, params, alive)
    print(f"preprocess fwd           {t*1e3:8.2f} ms")

    bins_f = jax.jit(lambda s: pack_bins(s, gx, gy, cap))
    t, bins = timeit(bins_f, screen)
    n_inst = int(bins.num_instances)
    n_valid = int(np.sum(np.asarray(bins.tile_id) < num_tiles))
    print(f"pack_bins total          {t*1e3:8.2f} ms  instances={n_inst} "
          f"valid={n_valid} ({100*n_valid/max(n_inst,1):.1f}%) overflow={int(bins.overflow)}")

    # ---- blend kernels alone
    fwd_k = jax.jit(lambda i, s, e: _run_forward(i, s, e, gx, gy, 16))
    t, fwd_out = timeit(fwd_k, bins.inst_t, bins.tile_start, bins.tile_end)
    print(f"blend fwd kernel         {t*1e3:8.2f} ms")

    dout = jnp.ones((num_tiles, 256, 8), jnp.float32) / (width * height)
    bwd_k = jax.jit(
        lambda i, s, e, f, d: _run_backward(i, s, e, f, d, gx, gy, 16)
    )
    t, dinst = timeit(bwd_k, bins.inst_t, bins.tile_start, bins.tile_end, fwd_out, dout)
    print(f"blend bwd kernel         {t*1e3:8.2f} ms")

    # ---- gradient scatter variants
    gid = bins.gauss_id
    k_pad = bins.inst_t.shape[1]
    gid_p = jnp.pad(gid, (0, k_pad - gid.shape[0])) if gid.shape[0] < k_pad else gid

    scat = jax.jit(lambda d, g: jnp.zeros((N_ROWS, n), jnp.float32).at[:, g].add(d))
    t, _ = timeit(scat, dinst, gid_p)
    print(f"scatter (16,K)->(16,N)   {t*1e3:8.2f} ms   [the production path]")

    scatT = jax.jit(lambda d, g: jnp.zeros((n, N_ROWS), jnp.float32).at[g].add(d.T))
    t, _ = timeit(scatT, dinst, gid_p)
    print(f"scatter rows (K,16)->(N,16) {t*1e3:5.2f} ms")

    seg = jax.jit(lambda d, g: jax.ops.segment_sum(d.T, g, num_segments=n))
    t, _ = timeit(seg, dinst, gid_p)
    print(f"segment_sum (K,16)->N    {t*1e3:8.2f} ms")

    # sorted-by-gid scatter: does indices_are_sorted help the engine?
    gid_sorted = jnp.sort(gid_p)
    scat_s = jax.jit(
        lambda d, g: jnp.zeros((n, N_ROWS), jnp.float32)
        .at[g]
        .add(d.T, indices_are_sorted=True)
    )
    t, _ = timeit(scat_s, dinst, gid_sorted)
    print(f"scatter sorted-hint      {t*1e3:8.2f} ms")

    # sort-back alternative: key + 10 payload columns
    key_cols = tuple(dinst[i] for i in range(10))
    sortback = jax.jit(
        lambda g, *cols: jax.lax.sort((g,) + cols, num_keys=1, is_stable=False)
    )
    t, _ = timeit(sortback, gid_p, *key_cols)
    print(f"sort-back gid+10 cols    {t*1e3:8.2f} ms")

    # ---- sort variants at this K (shape-matched synthetic operands)
    keys = np.random.default_rng(0)
    tk = jnp.asarray(keys.integers(0, num_tiles, k_pad, dtype=np.int32))
    dk = jnp.asarray(keys.integers(0, 1 << 30, k_pad, dtype=np.int32))
    gk = jnp.asarray(keys.integers(0, n, k_pad, dtype=np.int32))
    f32cols = [jnp.asarray(keys.random(k_pad, np.float32)) for _ in range(9)]

    for npay in (0, 3, 5, 9):
        f = jax.jit(
            lambda a, b, c, *cols: jax.lax.sort(
                (a, b, c) + cols, num_keys=3, is_stable=False
            )
        )
        t, _ = timeit(f, tk, dk, gk, *f32cols[:npay])
        print(f"sort 3 keys + {npay} f32 payload  {t*1e3:8.2f} ms")

    f2 = jax.jit(
        lambda a, b, *cols: jax.lax.sort((a, b) + cols, num_keys=2, is_stable=False)
    )
    t, _ = timeit(f2, tk, dk, *f32cols[:9])
    print(f"sort 2 keys + 9 f32 payload  {t*1e3:8.2f} ms")

    # batched per-band sorts: (bands, K/bands) along last axis. Two sizings:
    # evenly-split (ideal) and x1.6 padded rows (realistic max-band padding)
    for bands in (4, 8, 17, 68):
        for blowup in (1.0, 1.6):
            kb = int((k_pad * blowup) / bands + 511) // 512 * 512
            tot = bands * kb
            reps = (tot + k_pad - 1) // k_pad
            tkb = jnp.tile(tk, reps)[:tot].reshape(bands, kb)
            dkb = jnp.tile(dk, reps)[:tot].reshape(bands, kb)
            colsb = [jnp.tile(c, reps)[:tot].reshape(bands, kb) for c in f32cols]
            fb = jax.jit(
                lambda a, b, *cols: jax.lax.sort(
                    (a, b) + cols, num_keys=2, is_stable=False, dimension=1
                )
            )
            t, _ = timeit(fb, tkb, dkb, *colsb)
            print(f"batched sort {bands}x{kb} 2keys+9pay (x{blowup}) {t*1e3:8.2f} ms")

    # ---- garden-scale points: sort + scatter at K = 4.5M
    kg = 4_500_000 // 512 * 512
    tkg = jnp.asarray(keys.integers(0, 8160, kg, dtype=np.int32))
    dkg = jnp.asarray(keys.integers(0, 1 << 30, kg, dtype=np.int32))
    gkg = jnp.asarray(keys.integers(0, 1 << 20, kg, dtype=np.int32))
    f32g = [jnp.asarray(keys.random(kg, np.float32)) for _ in range(9)]
    fg = jax.jit(
        lambda a, b, c, *cols: jax.lax.sort(
            (a, b, c) + cols, num_keys=3, is_stable=False
        )
    )
    t, _ = timeit(fg, tkg, dkg, gkg, *f32g, iters=5)
    print(f"sort 3keys+9pay @4.5M       {t*1e3:8.2f} ms")
    dg = jnp.asarray(keys.random((N_ROWS, kg), np.float32))
    ng = 1 << 20
    scg = jax.jit(lambda d, g: jnp.zeros((N_ROWS, ng), jnp.float32).at[:, g].add(d))
    t, _ = timeit(scg, dg, gkg, iters=5)
    print(f"scatter (16,4.5M)->(16,1M)  {t*1e3:8.2f} ms")
    for bands in (8, 17):
        kb = int((kg * 1.3) / bands + 511) // 512 * 512
        tot = bands * kb
        reps = (tot + kg - 1) // kg
        tkb = jnp.tile(tkg, reps)[:tot].reshape(bands, kb)
        dkb = jnp.tile(dkg, reps)[:tot].reshape(bands, kb)
        colsb = [jnp.tile(c, reps)[:tot].reshape(bands, kb) for c in f32g]
        fb = jax.jit(
            lambda a, b, *cols: jax.lax.sort(
                (a, b) + cols, num_keys=2, is_stable=False, dimension=1
            )
        )
        t, _ = timeit(fb, tkb, dkb, *colsb, iters=5)
        print(f"batched sort {bands}x{kb} 2keys+9pay @garden {t*1e3:8.2f} ms")

    # ---- batched power matmul: B(256,6) @ Q(6,128k) HIGHEST vs the ~9 VPU
    # ops/chunk it would replace (is a k-wide rhs cheap enough per chunk?)
    B = jnp.asarray(keys.random((256, 8), np.float32))  # pad 6->8 sublanes
    for kappa in (1, 2, 4, 8, 16):
        Q = jnp.asarray(keys.random((8, 128 * kappa), np.float32))

        def mm(B, Q, kappa=kappa):
            def body(i, acc):
                return acc + jax.lax.dot_general(
                    B, Q, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
            return jax.lax.fori_loop(0, 200, body, jnp.zeros((256, 128 * kappa)))

        t, _ = timeit(jax.jit(mm), B, Q)
        print(f"power matmul kappa={kappa:2d}  {t/200*1e6:8.2f} us/call "
              f"({t/200/kappa*1e6:.2f} us/chunk)")

    # VPU baseline: 9 elementwise ops on (256,128)
    X = jnp.asarray(keys.random((256, 128), np.float32))

    def vpu(X):
        def body(i, a):
            for _ in range(3):
                a = a * X + X
            return a * 1.0000001
        return jax.lax.fori_loop(0, 200, body, X)

    t, _ = timeit(jax.jit(vpu), X)
    print(f"VPU 9ops on (256,128)       {t/200*1e6:8.2f} us/chunk-equiv")
    print("done")


if __name__ == "__main__":
    main()
