#!/usr/bin/env python
"""BASELINE config-5 rehearsal: a city-scale (>2^24 gaussians) scene through
gaussian-axis sharding on the 8-virtual-device CPU mesh.

The single-chip binning path carries gaussian ids and cumulative instance
counts as f32 (exact only below 2^24) and FAILS LOUDLY past that
(`ops/binning.py::_check_f32_exact_limits`) with the instruction to shard the
gaussian axis. The reference has no such ceiling (64-bit keys + dynamically
resized buffers, `rasterizer_impl.cu:303-311`), so the sharded escape hatch
must be a TESTED instruction, not a hope. This script demonstrates both
halves on one host:

  1. single-device render of an 17.8M-gaussian scene refuses to trace
     (ValueError naming the remedy);
  2. the SAME scene renders AND takes a gradient through the multi-host
     pipeline (mesh host=2 x gauss=2 x tile=2, `gauss_axes=("host","gauss")`
     — the hierarchical DCN/ICI exchange of `parallel/pipeline.py`) with the
     band-bucketed exchange keeping the gathered set small: per-shard rows
     17.8M/4 = 4.46M < 2^24, so every shard-local count stays f32-exact.

The instance axis splits the same way: per-BAND capacity is
`instance_capacity // n_tile`, so a >2^24-instance frame shards below the
ceiling over the tile axis (8 bands x 2^24 ~ 134M instances) — the counts
here stay small (17.5M of the rows are off-frustum filler) because a CPU
host cannot blend city-scale overdraw in reasonable time; what this
rehearsal certifies is the GUARD + ESCAPE wiring at a true >2^24 row count.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python -m scripts.rehearse_config5
"""

from __future__ import annotations

import json
import os
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


N_TOTAL = (1 << 24) + (1 << 20)  # 17,825,792 gaussians: past the ceiling
N_VISIBLE = 1 << 18  # rows actually inside the frustum
WIDTH, HEIGHT = 256, 128


def big_scene():
    from gsplat_tpu.core.types import Camera, GaussianParams
    from gsplat_tpu.utils.graphics import projection_matrix, world_to_view

    rng = np.random.default_rng(0)
    n = N_TOTAL
    # visible rows scattered through the frustum; the rest far off-screen
    # laterally (frustum-culled in preprocess, but every per-gaussian stage
    # still walks them — that is the point of primitive sharding)
    xyz = np.empty((n, 3), np.float32)
    xyz[:N_VISIBLE] = rng.normal(0, 1.0, (N_VISIBLE, 3))
    far = rng.normal(0, 1.0, (n - N_VISIBLE, 3)).astype(np.float32)
    far[:, :2] += np.sign(far[:, :2]) * 2000.0
    xyz[N_VISIBLE:] = far
    params = GaussianParams(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.asarray(rng.normal(0, 0.3, (n, 1, 3)).astype(np.float32)),
        features_rest=jnp.zeros((n, 0, 3), jnp.float32),  # sh_degree 0
        scaling=jnp.asarray(
            np.log(rng.uniform(0.002, 0.012, (n, 3))).astype(np.float32)
        ),
        rotation=jnp.asarray(rng.normal(0, 1, (n, 4)).astype(np.float32)),
        opacity=jnp.asarray(rng.normal(0, 1, (n, 1)).astype(np.float32)),
    )
    alive = jnp.ones((n,), bool)
    fovx, fovy = 0.9, 0.7
    w2v = world_to_view(np.eye(3), np.array([0.0, 0.0, 4.0]))
    proj = projection_matrix(0.01, 100.0, fovx, fovy)
    camera = Camera(
        world_view=jnp.asarray(w2v),
        full_proj=jnp.asarray((proj @ w2v).astype(np.float32)),
        camera_center=jnp.asarray(np.linalg.inv(w2v)[:3, 3].astype(np.float32)),
        tan_fovx=jnp.float32(np.tan(fovx / 2)),
        tan_fovy=jnp.float32(np.tan(fovy / 2)),
        width=WIDTH,
        height=HEIGHT,
    )
    return params, alive, camera


def main():
    from jax.sharding import Mesh

    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.parallel.pipeline import make_sharded_render
    from gsplat_tpu.parallel.sharding import param_spec
    from gsplat_tpu.render import render

    t0 = time.time()
    params, alive, camera = big_scene()
    settings = make_render_settings(
        sh_degree=0, instance_capacity=1 << 20, max_per_tile=4096,
        backend="jnp",
    )

    # 1) the single-device guard fires with the remedy in the message
    guard_msg = None
    try:
        jax.eval_shape(
            lambda p, a: render(camera, p, a, settings, jnp.zeros(3)),
            params, alive,
        )
    except ValueError as e:
        guard_msg = str(e)
    assert guard_msg is not None and "2^24" in guard_msg, guard_msg
    print(f"[guard] single-device refuses {N_TOTAL} gaussians: {guard_msg}")

    # 2) the sharded escape: host=2 x gauss=2 x tile=2
    devices = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devices, ("host", "gauss", "tile"))
    gaxes = ("host", "gauss")
    render_fn = make_sharded_render(
        mesh, settings, WIDTH, HEIGHT, gauss_axes=gaxes,
        exchange_capacity=1 << 19,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    params = jax.device_put(
        params, NamedSharding(mesh, P(gaxes))
    )
    alive = jax.device_put(alive, NamedSharding(mesh, P(gaxes)))

    def loss(p, a):
        out = render_fn(camera, p, a, jnp.zeros(3))
        return out["render"].mean(), (
            out["instance_overflow"], out["band_overflow"], out["num_instances"]
        )

    (val, (inst_of, band_of, ninst)), grads = jax.jit(
        jax.value_and_grad(loss, has_aux=True)
    )(params, alive)
    gnorm = float(
        sum(jnp.sum(g * g) for g in jax.tree_util.tree_leaves(grads))
    ) ** 0.5
    result = {
        "n_gaussians": N_TOTAL,
        "per_shard_rows": N_TOTAL // 4,
        "mesh": "host=2 x gauss=2 x tile=2",
        "loss": float(val),
        "grad_norm": gnorm,
        "num_instances": int(ninst),
        "instance_overflow": int(inst_of),
        "band_overflow": int(band_of),
        "wall_s": round(time.time() - t0, 1),
    }
    assert np.isfinite(result["loss"]) and np.isfinite(gnorm)
    assert result["instance_overflow"] == 0
    print(json.dumps(result))


if __name__ == "__main__":
    main()
