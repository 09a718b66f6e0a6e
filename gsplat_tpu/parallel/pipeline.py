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


def make_sharded_render(
    mesh: Mesh,
    settings: RenderSettings,
    width: int,
    height: int,
    gauss_axes=("gauss",),
    exchange_capacity: int | None = None,
):
    """Build a differentiable multi-chip render over the explicit pipeline.

    Returns fn(camera, params, alive, bg, mean2d_offset=None, exposure=None)
    -> dict with "render"/"invdepth" (rows sharded over the 'tile' axis),
    "radii"/"visibility" (gauss-sharded). Params/alive/mean2d_offset must be
    row-sharded over `gauss_axes` (see shard_params).

    `gauss_axes` may name several mesh axes, e.g. ("host", "gauss") for a
    multi-host primitive-sharded run: the screen-packet all_gather then runs
    hierarchically (ICI inside a host, DCN across hosts), and its autodiff
    transpose — the parameter-gradient psum_scatter — follows the same
    hierarchy. The 'tile' axis always stays intra-host (ICI): tile shards
    exchange whole images' worth of gradients every step.

    `exchange_capacity` switches the screen-packet exchange to the
    BAND-BUCKETED form (docs/PERF_HEADROOM.md "Multi-chip cost model"): each
    gaussian shard first compacts its packets to the rows whose tile rect
    intersects the local device's band of tile rows (the MemTile
    distribute/join analogue — the reference's AIE design likewise never
    broadcast everything everywhere, `GS-IRON/npu-1/NPU/precomp.py:113-134`),
    and the all_gather moves `exchange_capacity` rows per shard instead of
    the full shard. This cuts both the ICI bytes and — the dominant term —
    every post-gather O(N_global) stage (the pack_bins table build/cumsum)
    down to the band's working set. The compaction is a row-gather, so its
    autodiff transpose is a scatter-add back to the owning rows, composing
    with the all_gather's psum_scatter transpose. Compaction overflow (more
    band-intersecting rows than capacity) is reported as the separate
    `band_overflow` metric — it drives the exchange-capacity controller
    only, never the instance-capacity one. None = the plain full gather.
    """
    tile = settings.tile
    gx = (width + tile - 1) // tile
    gy = (height + tile - 1) // tile
    n_tile = mesh.shape["tile"]
    assert gy % n_tile == 0, f"tile rows {gy} must divide over tile axis {n_tile}"
    gy_local = gy // n_tile
    cap_local = settings.instance_capacity // n_tile
    gaxes = tuple(gauss_axes)

    # band coordinates: the blend kernel derives pixel y from the local tile
    # row, i.e. pixels are rendered as if the band started at y=0 — shift the
    # projected centers down by row0*tile inside local_render instead.
    def local_render_shifted(params, alive, mean2d_offset, camera, bg):
        row0_px = jax.lax.axis_index("tile") * gy_local * tile

        screen = preprocess(
            params, alive, camera, settings, gx, gy, mean2d_offset
        )
        radii = screen.radius
        row0_band = jax.lax.axis_index("tile") * gy_local
        band_overflow = jnp.zeros((), jnp.int32)
        band_count = jnp.zeros((), jnp.int32)

        if exchange_capacity is not None:
            # band-bucketed exchange: keep only rows whose rect intersects
            # this device's band before gathering. The selection index table
            # is non-differentiable structure; the row-gather itself is in
            # the autodiff graph (transpose: scatter-add to owning rows).
            inter = (
                screen.mask
                & (screen.rect_min[:, 1] < row0_band + gy_local)
                & (screen.rect_max[:, 1] > row0_band)
            )
            pos = jnp.cumsum(inter.astype(jnp.int32)) - 1
            count = jnp.where(inter.shape[0] > 0, pos[-1] + 1, 0)
            pos = jnp.where(inter & (pos < exchange_capacity), pos, exchange_capacity)
            iota = jnp.arange(inter.shape[0], dtype=jnp.int32)
            sel = (
                jnp.zeros((exchange_capacity + 1,), jnp.int32)
                .at[pos]
                .set(iota, mode="drop")[:exchange_capacity]
            )
            sel = jax.lax.stop_gradient(sel)
            slot_live = jnp.arange(exchange_capacity) < count
            screen = jax.tree.map(lambda x: x[sel], screen)
            # tail slots hold row duplicates — mask them out of the binning
            screen = screen.replace(
                mask=screen.mask & slot_live,
                tiles_touched=jnp.where(slot_live, screen.tiles_touched, 0),
            )
            # reduce over the gaussian axes NOW: these are per-gauss-shard
            # quantities, and the P("tile") out_spec is only well-defined
            # for values invariant along the unmentioned 'gauss' axis
            band_overflow = jax.lax.psum(
                jnp.maximum(count - exchange_capacity, 0), gaxes
            )
            band_count = jax.lax.pmax(count, gaxes)

        # MemTile-join analogue: gather the compact screen packets from all
        # gaussian shards (innermost axis first: ICI before DCN when
        # gauss_axes spans hosts). In reverse-mode AD this all_gather
        # transposes into a psum_scatter of the screen-space gradients back
        # to the owning shard — the explicit gradient collective.
        def gather(x):
            for ax in reversed(gaxes):
                x = jax.lax.all_gather(x, ax, axis=0, tiled=True)
            return x

        screen_g = jax.tree.map(gather, screen)

        local = restrict_to_tile_rows(screen_g, row0_band, gy_local, gx)
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
                settings.tight_cull, packet_dtype=settings.packet_dtype,
            )
            out = blend_tiles_pallas(
                local, bins, gx, gy_local, tile,
                reduce_pack=settings.packet_dtype == "hybrid",
            )
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
        return (
            img, invd_img, radii,
            # instance overflow and band overflow are reported SEPARATELY:
            # each drives its own capacity controller (summing them made the
            # instance controller grow/recompile for exchange overflows the
            # instance buffer never had)
            bins.overflow[None], bins.num_instances[None],
            band_overflow[None], band_count[None],
        )

    pspec = param_spec(gaxes)
    gspec = P(gaxes)
    sharded = shard_map(
        local_render_shifted,
        mesh=mesh,
        in_specs=(pspec, gspec, gspec, P(), P()),
        out_specs=(
            P("tile"), P("tile"), gspec, P("tile"), P("tile"),
            P("tile"), P("tile"),
        ),
        check_vma=False,
    )

    def render_fn(
        camera: Camera, params: GaussianParams, alive, bg,
        mean2d_offset=None, exposure=None,
    ):
        if mean2d_offset is None:
            mean2d_offset = jnp.zeros((params.capacity, 2), jnp.float32)
        img, invd, radii, overflow, ninst, b_of, b_cnt = sharded(
            params, alive, mean2d_offset, camera, bg
        )
        img = img[:height]
        if exposure is not None:
            # elementwise per pixel: the partitioner keeps it on tile shards
            img = jnp.einsum(
                "hwc,cd->hwd", img, exposure[:3, :3],
                precision=jax.lax.Precision.HIGHEST,
            ) + exposure[:3, 3]
        return {
            "render": jnp.clip(img, 0.0, 1.0),
            "invdepth": invd[:height],
            "radii": radii,
            "visibility": radii > 0,
            "instance_overflow": overflow.sum(),
            "tile_overflow": jnp.zeros((), jnp.int32),
            "num_instances": ninst.sum(),
            # band-exchange health (0s when exchange_capacity is None):
            # max-over-bands of compacted rows kept per shard, and rows
            # dropped for want of exchange capacity — the capacity
            # controller's (count, overflow) observation pair
            "band_overflow": b_of.sum(),
            "band_count": b_cnt.max(),
            # per-tile-band vectors (length n_tile; zeros without exchange):
            # the distribution the auto-sizer's max() observation summarizes
            "band_counts": b_cnt,
            "band_overflows": b_of,
        }

    return render_fn


def make_pipeline_train_step(
    mesh: Mesh,
    opt,
    settings: RenderSettings,
    width: int,
    height: int,
    use_exposure: bool = False,
    gauss_axes=("gauss",),
    exchange_capacity: int | None = None,
):
    """Production multi-chip train step over the explicit shard_map pipeline.

    Identical step semantics to `train.step.make_train_step`, with the render
    replaced by `make_sharded_render`: parameters/Adam state stay row-sharded
    on `gauss_axes`, the image/loss is tile-sharded, and the gradient
    collectives are the explicit all_gather/psum_scatter pair inside the
    shard_map (not partitioner-inferred). Use
    `sharding.place_train_state(mesh, state)` to place the state.
    """
    from gsplat_tpu.train.step import make_train_step

    render_fn = make_sharded_render(
        mesh, settings, width, height, gauss_axes=gauss_axes,
        exchange_capacity=exchange_capacity,
    )
    return make_train_step(
        opt, settings, use_exposure=use_exposure, render_fn=render_fn
    )
