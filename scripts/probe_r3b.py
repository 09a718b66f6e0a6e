#!/usr/bin/env python
"""Round-3b hardware A/B: the re-engineered backward blend (VPU c, merged
moment/feature matmul, folded conic) and the gid sort-back + streaming
reduce vs the round-2 scatter, at the bench config. Run AFTER warmup."""

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
    from gsplat_tpu.ops.binning import pack_bins
    from gsplat_tpu.ops.projection import preprocess
    from gsplat_tpu.ops.rasterize_pallas import _run_backward, _run_forward, N_ROWS
    from gsplat_tpu.ops.reduce import reduce_by_gid
    from gsplat_tpu.render import grid_dims, render

    width, height, n = 1920, 1080, 262_144
    params, alive, camera = _tiny_scene(
        n=n, width=width, height=height, sh_degree=3, capacity=n
    )
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

    def loss_fn(p, a):
        out = render(camera, p, a, settings, jnp.zeros(3))
        return out["render"].mean() + 0.0 * out["invdepth"].mean()

    step = jax.jit(jax.value_and_grad(loss_fn))
    t, (val, _) = timeit(step, params, alive, iters=5)
    print(f"FULL fwd+bwd             {t*1e3:8.2f} ms  -> {width*height/t/1e6:.2f} Mpix/s"
          f"  loss={float(val):.6f}")

    pre = jax.jit(lambda p, a: preprocess(p, a, camera, settings, gx, gy))
    _, screen = timeit(pre, params, alive)
    bins_f = jax.jit(lambda s: pack_bins(s, gx, gy, cap))
    t, bins = timeit(bins_f, screen)
    print(f"pack_bins total          {t*1e3:8.2f} ms")

    fwd_k = jax.jit(lambda i, s, e: _run_forward(i, s, e, gx, gy, 16))
    t, fwd_out = timeit(fwd_k, bins.inst_t, bins.tile_start, bins.tile_end)
    print(f"blend fwd kernel         {t*1e3:8.2f} ms   [r2: 29.97]")

    dout = jnp.ones((num_tiles, 256, 8), jnp.float32) / (width * height)
    bwd_k = jax.jit(lambda i, s, e, f, d: _run_backward(i, s, e, f, d, gx, gy, 16))
    t, dinst = timeit(bwd_k, bins.inst_t, bins.tile_start, bins.tile_end, fwd_out, dout)
    print(f"blend bwd kernel         {t*1e3:8.2f} ms   [r2: 45.00]")

    gid = bins.gauss_id
    k_pad = bins.inst_t.shape[1]
    gid_p = jnp.pad(gid, (0, k_pad - gid.shape[0])) if gid.shape[0] < k_pad else gid

    red = jax.jit(lambda d, g: reduce_by_gid(d, g, n))
    t, drows_new = timeit(red, dinst, gid_p)
    print(f"reduce_by_gid            {t*1e3:8.2f} ms   [r2 scatter: 21.16]")

    scat = jax.jit(lambda d, g: jnp.zeros((N_ROWS, n), jnp.float32).at[:, g].add(d))
    t, drows_old = timeit(scat, dinst, gid_p)
    print(f"scatter (16,K)->(16,N)   {t*1e3:8.2f} ms")

    # numerical parity of the two reductions
    a = np.asarray(drows_new)[:10]
    b = np.asarray(drows_old)[:10]
    denom = np.abs(b).max() + 1e-30
    print(f"reduce vs scatter: max abs diff {np.abs(a-b).max():.3e} "
          f"(rel {np.abs(a-b).max()/denom:.3e})")

    # garden-scale single point: 1M gaussians
    n2 = 1_048_576
    params2, alive2, camera2 = _tiny_scene(
        n=n2, width=width, height=height, sh_degree=3, capacity=n2
    )
    peak2 = probe_instance_capacity(
        params2, alive2, [type("C", (), {"camera": camera2})]
    )
    settings2 = make_render_settings(
        sh_degree=3, max_per_tile=4096, instance_capacity=round128(peak2),
        backend="pallas",
    )

    def loss2(p, a):
        out = render(camera2, p, a, settings2, jnp.zeros(3))
        return out["render"].mean() + 0.0 * out["invdepth"].mean()

    step2 = jax.jit(jax.value_and_grad(loss2))
    t, _ = timeit(step2, params2, alive2, iters=3)
    print(f"GARDEN 1M fwd+bwd        {t*1e3:8.2f} ms  -> {width*height/t/1e6:.2f} Mpix/s"
          f"  instances={int(peak2)}")
    print("done")


if __name__ == "__main__":
    main()
