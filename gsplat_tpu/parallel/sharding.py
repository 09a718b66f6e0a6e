"""Multi-chip execution: Gaussian-sharded + tile-sharded SPMD over a Mesh.

The reference has no multi-device story at all (SURVEY.md §2.5): its
parallelism is CUDA SIMT within one GPU plus the AIE dataflow tiles of the
NPU port. This module supplies the missing scaling axes, TPU-style:

- axis "gauss": the Gaussian set is sharded row-wise across devices —
  per-primitive preprocessing (projection/EWA/SH) runs fully sharded, the
  device-mesh analogue of GS-IRON's 4-way MemTile distribute of cov3D work
  (`GS-IRON/npu-1/NPU/precomp.py:113-118`).
- axis "tile": the image tile grid is sharded across devices — each device
  blends its tile shard, the analogue of one CUDA block per 16x16 tile
  (`forward.cu:417`) lifted to chips. Parameter gradients from different tile
  shards meet in a `psum`, which XLA lowers to an ICI all-reduce overlapped
  with the surrounding computation.

Implementation style: `jit` + `NamedSharding` on inputs/outputs with
`with_sharding_constraint` at the stage boundaries, letting the SPMD
partitioner place the collectives (all-gather of the compact screen-space
packets between the gauss-sharded preprocess and the tile-sharded blend; the
gradient psum in reverse). Hot-path hand-written collectives (shard_map +
pallas RDMA) can replace individual stages without changing this interface.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsplat_tpu.core.types import Camera, GaussianParams, RenderSettings
from gsplat_tpu.render import render


def make_mesh(n_gauss: int | None = None, n_tile: int | None = None, devices=None) -> Mesh:
    """Build a ("gauss", "tile") device mesh.

    Defaults: all devices on the gauss axis. Product must equal device count.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_gauss is None and n_tile is None:
        n_gauss, n_tile = n, 1
    elif n_gauss is None:
        n_gauss = n // n_tile
    elif n_tile is None:
        n_tile = n // n_gauss
    assert n_gauss * n_tile == n, f"mesh {n_gauss}x{n_tile} != {n} devices"
    return Mesh(devices.reshape(n_gauss, n_tile), ("gauss", "tile"))


def param_spec(axes=("gauss",)) -> GaussianParams:
    """Row-sharding over the gauss mesh axis (or axes, e.g. ("host","gauss")
    for multi-host primitive sharding) for every parameter leaf."""
    spec = P(tuple(axes))
    return GaussianParams(
        xyz=spec,
        features_dc=spec,
        features_rest=spec,
        scaling=spec,
        rotation=spec,
        opacity=spec,
    )


def shard_params(params: GaussianParams, alive, mesh: Mesh):
    """Place (params, alive) row-sharded on the mesh (capacity must divide)."""
    pspec = jax.tree.map(lambda s: NamedSharding(mesh, s), param_spec())
    params = jax.tree.map(jax.device_put, params, pspec)
    alive = jax.device_put(alive, NamedSharding(mesh, P("gauss")))
    return params, alive


def sharded_render(mesh: Mesh, settings: RenderSettings):
    """Build a jitted render with gauss-sharded params and tile-sharded image.

    The (H, W, ...) outputs are sharded over rows (H) on the "tile" axis:
    row-blocks of 16-pixel tiles land per-device, matching the tile-major
    layout inside the rasterizer.
    """
    pspec = jax.tree.map(lambda s: NamedSharding(mesh, s), param_spec())
    out_shard = NamedSharding(mesh, P("tile"))

    @partial(
        jax.jit,
        in_shardings=(None, pspec, NamedSharding(mesh, P("gauss")), None),
        out_shardings=None,
    )
    def _render(camera, params, alive, bg):
        out = render(camera, params, alive, settings, bg)
        out["render"] = jax.lax.with_sharding_constraint(out["render"], out_shard)
        out["invdepth"] = jax.lax.with_sharding_constraint(out["invdepth"], out_shard)
        return out

    return _render


def train_state_shardings(mesh: Mesh, state, gauss_axes=("gauss",)):
    """NamedSharding pytree for a TrainState: model-row leaves on the gauss
    axis (or axes), everything else replicated."""
    gauss = NamedSharding(mesh, P(tuple(gauss_axes)))
    repl = NamedSharding(mesh, P())
    pspec = jax.tree.map(lambda s: NamedSharding(mesh, s), param_spec(gauss_axes))
    return state.replace(
        params=pspec,
        adam_m=pspec,
        adam_v=pspec,
        alive=gauss,
        adam_counts=gauss,
        stats=jax.tree.map(lambda _: gauss, state.stats),
        exposure=repl, exp_m=repl, exp_v=repl, exp_step=repl,
        rng=repl, step=repl,
    )


def place_train_state(mesh: Mesh, state, gauss_axes=("gauss",)):
    """Commit a TrainState to the mesh (initially, and after any
    gaussian-capacity resize, whose padded rows arrive host-placed)."""
    return jax.device_put(state, train_state_shardings(mesh, state, gauss_axes))


def sharded_train_step(mesh: Mesh, opt, settings: RenderSettings, use_exposure=False):
    """The fully-jitted train step compiled for a multi-chip mesh.

    Shardings:
      - model params / Adam moments / stats: P("gauss") rows
      - gt image + masks: P("tile") over H (pixel rows)
      - everything else replicated
    The loss is computed over the tile-sharded image, so parameter cotangents
    are partial sums per tile shard; the partitioner inserts the psum over
    "tile" (ICI all-reduce) exactly where the reference's single-GPU autograd
    had a local accumulation.
    """
    from gsplat_tpu.train.step import make_train_step

    base_step = make_train_step(opt, settings, use_exposure=use_exposure)

    tile_rows = NamedSharding(mesh, P("tile"))

    def place_state(state):
        return place_train_state(mesh, state)

    @jax.jit
    def step(state, camera, gt, mask, invd, dmask, bg, xyz_lr, exp_lr, depth_w, exp_idx):
        gt = jax.lax.with_sharding_constraint(gt, tile_rows)
        mask = jax.lax.with_sharding_constraint(mask, tile_rows)
        invd = jax.lax.with_sharding_constraint(invd, tile_rows)
        dmask = jax.lax.with_sharding_constraint(dmask, tile_rows)
        return base_step(state, camera, gt, mask, invd, dmask, bg, xyz_lr, exp_lr, depth_w, exp_idx)

    return step, place_state
