"""Explicit shard_map render/train pipeline over the ("gauss","tile") mesh.

Where `sharding.py` lets the SPMD partitioner place collectives from
annotations, this module writes the multi-chip dataflow out explicitly — the
device-mesh re-creation of the reference's AIE dataflow graph
(`GS-IRON/npu-1/NPU/precomp.py:89-189`):

  per-device Gaussian shard --preprocess-->
      screen packets --all_gather('gauss')-->        [MemTile join analogue]
  per-device tile-row shard --bin+sort+blend--> image rows
      (loss on tile shards; autodiff turns the all_gather into a
       psum_scatter of screen-space gradients back to the owning shard —
       the ICI all-reduce the reference never had)

Each device runs the SAME single-chip kernels (binning, Pallas blend) on its
local tile rows, so the entire single-chip optimization work carries over
per-shard unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gsplat_tpu.core.types import Camera, GaussianParams, RenderSettings
from gsplat_tpu.ops.binning import bin_gaussians
from gsplat_tpu.ops.projection import preprocess
from gsplat_tpu.ops.rasterize_jnp import blend_tiles_jnp, tiles_to_image
from gsplat_tpu.parallel.sharding import param_spec


def restrict_to_tile_rows(screen, row0, n_rows, grid_x):
    """Clip per-gaussian tile rects to a horizontal band of tile rows and
    rebase tile-y to the band. Gaussians outside the band get 0 tiles."""
    rmin = screen.rect_min
    rmax = screen.rect_max
    rmin_y = jnp.clip(rmin[:, 1], row0, row0 + n_rows) - row0
    rmax_y = jnp.clip(rmax[:, 1], row0, row0 + n_rows) - row0
    tiles = (rmax[:, 0] - rmin[:, 0]) * (rmax_y - rmin_y)
    tiles = jnp.where(screen.mask, tiles, 0)
    return screen.replace(
        rect_min=jnp.stack([rmin[:, 0], rmin_y], axis=-1),
        rect_max=jnp.stack([rmax[:, 0], rmax_y], axis=-1),
        tiles_touched=tiles,
        mask=screen.mask & (tiles > 0),
    )


def make_sharded_render(mesh: Mesh, settings: RenderSettings, width: int, height: int):
    """Build a differentiable multi-chip render.

    Returns fn(camera, params, alive, bg) -> dict with "render"/"invdepth"
    (rows sharded over the 'tile' axis), "radii"/"visibility" (gauss-sharded).
    Params/alive must be row-sharded over 'gauss' (see shard_params).
    """
    tile = settings.tile
    gx = (width + tile - 1) // tile
    gy = (height + tile - 1) // tile
    n_tile = mesh.shape["tile"]
    assert gy % n_tile == 0, f"tile rows {gy} must divide over tile axis {n_tile}"
    gy_local = gy // n_tile
    cap_local = settings.instance_capacity // n_tile

    # band coordinates: the blend kernel derives pixel y from the local tile
    # row, i.e. pixels are rendered as if the band started at y=0 — shift the
    # projected centers down by row0*tile inside local_render instead.
    def local_render_shifted(params, alive, camera, bg):
        row0_px = jax.lax.axis_index("tile") * gy_local * tile

        screen = preprocess(params, alive, camera, settings, gx, gy)
        screen_g = jax.tree.map(
            lambda x: jax.lax.all_gather(x, "gauss", axis=0, tiled=True), screen
        )
        radii = screen.radius

        row0 = jax.lax.axis_index("tile") * gy_local
        local = restrict_to_tile_rows(screen_g, row0, gy_local, gx)
        local = local.replace(
            mean2d=local.mean2d - jnp.stack(
                [jnp.zeros((), jnp.float32), row0_px.astype(jnp.float32)]
            )
        )
        if settings.backend == "pallas":
            from gsplat_tpu.ops.binning import pack_bins
            from gsplat_tpu.ops.rasterize_pallas import blend_tiles_pallas

            bins = pack_bins(
                local, gx, gy_local, cap_local, settings.tile,
                settings.tight_cull, packet_dtype=jnp.dtype(settings.packet_dtype),
            )
            out = blend_tiles_pallas(local, bins, gx, gy_local, tile)
        else:
            bins = bin_gaussians(
                local, gx, gy_local, cap_local, settings.tile, settings.tight_cull
            )
            out = blend_tiles_jnp(
                local, bins, gx, gy_local, tile, settings.max_per_tile, settings.chunk
            )
        bgc = jnp.asarray(bg, jnp.float32)
        color = out.color + out.final_t[..., None] * bgc[None, None, :]
        img = tiles_to_image(color, gx, gy_local, tile, width, gy_local * tile)
        invd_img = tiles_to_image(out.invdepth, gx, gy_local, tile, width, gy_local * tile)
        return img, invd_img, radii, bins.overflow[None]

    pspec = param_spec()
    sharded = shard_map(
        local_render_shifted,
        mesh=mesh,
        in_specs=(pspec, P("gauss"), P(), P()),
        out_specs=(P("tile"), P("tile"), P("gauss"), P("tile")),
        check_vma=False,
    )

    def render_fn(camera: Camera, params: GaussianParams, alive, bg):
        img, invd, radii, overflow = sharded(params, alive, camera, bg)
        return {
            "render": jnp.clip(img[:height], 0.0, 1.0),
            "invdepth": invd[:height],
            "radii": radii,
            "visibility": radii > 0,
            "instance_overflow": overflow.sum(),
        }

    return render_fn
