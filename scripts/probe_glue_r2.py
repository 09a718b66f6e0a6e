#!/usr/bin/env python
"""Round-2 glue probes: where do preprocess/binning/pack/segment_sum actually
spend their time at bench scale, and which alternative formulations are
faster on this chip. Run on the real TPU."""

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
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.core import activations as act
    from gsplat_tpu.core import sh as sh_lib
    from gsplat_tpu.ops.projection import preprocess, compute_cov2d
    from gsplat_tpu.ops.binning import bin_gaussians
    from gsplat_tpu.render import grid_dims

    width, height, n = 1920, 1080, 262_144
    params, alive, camera = _tiny_scene(n=n, width=width, height=height, sh_degree=3, capacity=n)
    K = 1_130_368  # bench-scale instance capacity (round128 of probe)
    settings = make_render_settings(
        sh_degree=3, max_per_tile=2048, instance_capacity=K, backend="pallas"
    )
    gx, gy = grid_dims(camera, settings.tile)

    print("=== preprocess breakdown (n=262k) ===")
    xyz = params.xyz

    f = jax.jit(lambda p: act.scaling_activation(p.scaling))
    t, _ = timeit(f, params); print(f"scaling act          {t*1e3:8.2f} ms")
    f = jax.jit(lambda p: act.normalize_rotation(p.rotation))
    t, _ = timeit(f, params); print(f"quat normalize       {t*1e3:8.2f} ms")
    f = jax.jit(lambda p: act.covariance_from_scaling_rotation(
        act.scaling_activation(p.scaling), 1.0, act.normalize_rotation(p.rotation)))
    t, _ = timeit(f, params); print(f"cov3d (act+quat+cov) {t*1e3:8.2f} ms")
    f = jax.jit(lambda x: jnp.einsum('nj,ij->ni', x, camera.world_view[:3, :3],
                                     precision=jax.lax.Precision.HIGHEST) + camera.world_view[:3, 3])
    t, _ = timeit(f, xyz); print(f"view xform (HIGHEST) {t*1e3:8.2f} ms")
    feats = jnp.concatenate([params.features_dc, params.features_rest], axis=1)
    f = jax.jit(lambda ft, x: sh_lib.eval_sh_color(3, ft, x - camera.camera_center)[0])
    t, _ = timeit(f, feats, xyz); print(f"SH deg3 color        {t*1e3:8.2f} ms")
    cov3d = act.covariance_from_scaling_rotation(
        act.scaling_activation(params.scaling), 1.0, act.normalize_rotation(params.rotation))
    pv = jnp.einsum('nj,ij->ni', xyz, camera.world_view[:3, :3]) + camera.world_view[:3, 3]
    pv = pv.at[:, 2].set(jnp.abs(pv[:, 2]) + 0.3)
    f = jax.jit(lambda p, c: compute_cov2d(p, 1000.0, 1000.0, 0.8, 0.45, c, camera.world_view))
    t, _ = timeit(f, pv, cov3d); print(f"cov2d EWA            {t*1e3:8.2f} ms")
    f = jax.jit(lambda p, a: preprocess(p, a, camera, settings, gx, gy))
    t, screen = timeit(f, params, alive); print(f"full preprocess      {t*1e3:8.2f} ms")
    # grad of preprocess wrt params (sum of outputs) to see bwd cost
    def pre_loss(p, a):
        s = preprocess(p, a, camera, settings, gx, gy)
        return (jnp.sum(s.mean2d) + jnp.sum(s.conic) + jnp.sum(s.opacity)
                + jnp.sum(s.rgb) + jnp.sum(s.depth))
    f = jax.jit(jax.grad(pre_loss))
    t, _ = timeit(f, params, alive); print(f"preprocess fwd+bwd   {t*1e3:8.2f} ms")

    print("=== binning breakdown (K=%d) ===" % K)
    n_ = n
    iota = jnp.arange(n_, dtype=jnp.int32)
    live = screen.tiles_touched > 0
    depth_key = jnp.where(live, screen.depth, jnp.inf)
    f = jax.jit(lambda dk, i: jax.lax.sort((dk, i), num_keys=1, is_stable=True))
    t, (_, order) = timeit(f, depth_key, iota); print(f"depth sort N         {t*1e3:8.2f} ms")

    rect_w_all = jnp.maximum(screen.rect_max[:, 0] - screen.rect_min[:, 0], 1)
    pre = jnp.stack([
        screen.tiles_touched.astype(jnp.float32),
        screen.rect_min[:, 0].astype(jnp.float32),
        screen.rect_min[:, 1].astype(jnp.float32),
        rect_w_all.astype(jnp.float32),
        iota.astype(jnp.float32),
        screen.mean2d[:, 0],
        screen.mean2d[:, 1],
        screen.cull_qmax,
    ], axis=1)
    f = jax.jit(lambda p, o: p[o])
    t, pre_o = timeit(f, pre, order); print(f"pre row-gather (N,8) {t*1e3:8.2f} ms")

    tiles_i = pre_o[:, 0].astype(jnp.int32)
    cum = jnp.cumsum(tiles_i)
    cum_excl = cum - tiles_i
    tbl = pre_o.at[:, 0].set(jnp.minimum(cum_excl, 1 << 24).astype(jnp.float32))
    delta = jnp.concatenate([tbl[:1], tbl[1:] - tbl[:-1]], axis=0)
    start_slot = jnp.where(cum_excl < K, cum_excl, K)
    f = jax.jit(lambda d, s: jnp.zeros((K + 1, 8), jnp.float32).at[s].add(d, mode="drop"))
    t, grid = timeit(f, delta, start_slot); print(f"delta scatter (N)->K {t*1e3:8.2f} ms")
    f = jax.jit(lambda g: jnp.cumsum(g[:K], axis=0))
    t, rows = timeit(f, grid); print(f"cumsum (K,8)         {t*1e3:8.2f} ms")
    f = jax.jit(lambda s: bin_gaussians(s, gx, gy, K))
    t, bins = timeit(f, screen); print(f"full binning         {t*1e3:8.2f} ms  inst={int(bins.num_instances)}")

    print("=== sort scaling at K (key=tile) ===")
    tile_key = bins.tile_id
    gid = bins.gauss_id
    key = jax.random.PRNGKey(0)
    cols = jax.random.normal(key, (K, 16), jnp.float32)
    for p in (1, 2, 4, 6, 10):
        args = (tile_key,) + tuple(cols[:, i] for i in range(p))
        f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=1, is_stable=True))
        t, _ = timeit(f, *args); print(f"sort key+{p:2d}col       {t*1e3:8.2f} ms")
    # 3-key unstable (packed tile|depth-bits as 2 int keys)
    k2 = jax.random.randint(key, (K,), 0, 1 << 16)
    f = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2, is_stable=False))
    t, _ = timeit(f, tile_key, k2, gid); print(f"sort 2key+1col       {t*1e3:8.2f} ms")

    print("=== gather variants (K rows from (N,16)) ===")
    table = jax.random.normal(key, (n_, 16), jnp.float32)
    f = jax.jit(lambda t_, g: t_[g])
    t, _ = timeit(f, table, gid); print(f"row-gather (K,16)    {t*1e3:8.2f} ms")
    f = jax.jit(lambda t_, g: t_[g].T.copy())
    t, _ = timeit(f, table, gid); print(f"gather+transpose     {t*1e3:8.2f} ms")
    f = jax.jit(lambda t_, g: jnp.take(t_, g, axis=0, unique_indices=False,
                                       indices_are_sorted=False))
    t, _ = timeit(f, table, gid); print(f"jnp.take             {t*1e3:8.2f} ms")
    tableT = table.T.copy()  # (16, N)
    f = jax.jit(lambda t_, g: t_[:, g])
    t, _ = timeit(f, tableT, gid); print(f"col-gather (16,K)    {t*1e3:8.2f} ms")
    sorted_gid = jnp.sort(gid)
    f = jax.jit(lambda t_, g: jnp.take(t_, g, axis=0, indices_are_sorted=True))
    t, _ = timeit(f, table, sorted_gid); print(f"take sorted hint     {t*1e3:8.2f} ms")

    print("=== segment_sum variants ((K,16) -> (N,16)) ===")
    rows16 = jax.random.normal(key, (K, 16), jnp.float32)
    f = jax.jit(lambda r, g: jax.ops.segment_sum(r, g, num_segments=n_))
    t, _ = timeit(f, rows16, gid); print(f"segment_sum          {t*1e3:8.2f} ms")
    f = jax.jit(lambda r, g: jnp.zeros((n_, 16), jnp.float32).at[g].add(r))
    t, _ = timeit(f, rows16, gid); print(f"scatter-add          {t*1e3:8.2f} ms")
    # transposed: scatter into (16, N) from (16, K)
    rows16T = rows16.T.copy()
    f = jax.jit(lambda r, g: jnp.zeros((16, n_), jnp.float32).at[:, g].add(r))
    t, _ = timeit(f, rows16T, gid); print(f"scatter-add T        {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
