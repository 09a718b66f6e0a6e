"""High-level differentiable renderer (the `gaussian_renderer.render` analogue).

Mirrors the reference façade (`gaussian_renderer/__init__.py:18-128`):
assemble settings, run the rasterizer, optionally apply the learned exposure
affine, and return the image plus the auxiliary tensors the training loop
needs (viewspace-gradient hook, visibility, radii, inverse depth).

Differences by design (TPU-first):
- images are HWC (channel-last) throughout — the natural layout for XLA.
- the "screenspace_points" grad-capture tensor becomes an explicit
  `mean2d_offset` argument: pass zeros and differentiate the loss w.r.t. it
  to obtain the densification gradient signal.
- everything is functional and jit-able; no global state.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from gsplat_tpu.core.types import Camera, GaussianParams, RenderSettings
from gsplat_tpu.ops.binning import bin_gaussians
from gsplat_tpu.ops.projection import preprocess
from gsplat_tpu.ops.rasterize_jnp import blend_tiles_jnp, tiles_to_image


def grid_dims(camera: Camera, tile: int):
    return (camera.width + tile - 1) // tile, (camera.height + tile - 1) // tile


def mark_visible(positions, camera: Camera):
    """Frustum-visibility mask for a set of world positions.

    The `GaussianRasterizer.markVisible` API (`__init__.py:163-172` ->
    `markVisible` kernel, `rasterize_points.cu:225-244`): view-space z > 0.2,
    matching `in_frustum` with its disabled xy-bounds check
    (`auxiliary.h:151-176`)."""
    p_view = (
        jnp.einsum("nj,ij->ni", positions, camera.world_view[:3, :3],
                   precision=jax.lax.Precision.HIGHEST)
        + camera.world_view[:3, 3]
    )
    return p_view[:, 2] > 0.2


def render(
    camera: Camera,
    params: GaussianParams,
    alive,
    settings: RenderSettings,
    bg,
    mean2d_offset=None,
    exposure: Optional[Any] = None,
) -> dict:
    """Render one view.

    Args:
      camera: the view (width/height static).
      params: Gaussian parameters (pre-activation), static capacity.
      alive: (N,) bool live-row mask.
      settings: static rasterization settings.
      bg: (3,) background color.
      mean2d_offset: optional (N, 2) zeros; gradients w.r.t. it are the
        viewspace densification signal (pixel units — multiply by
        (0.5*W, 0.5*H) for parity with the reference's NDC-scaled stats,
        `backward.cu:525-528,626-627`).
      exposure: optional (3, 4) affine applied to the rendered image
        (`gaussian_renderer/__init__.py:113-115`).

    Returns:
      dict with "render" (H, W, 3) in [0, 1], "invdepth" (H, W),
      "radii" (N,), "visibility" (N,) bool, "final_t" (H, W),
      "overflow" diagnostics.
    """
    gx, gy = grid_dims(camera, settings.tile)

    screen = preprocess(params, alive, camera, settings, gx, gy, mean2d_offset)

    if settings.backend == "pallas":
        from gsplat_tpu.ops.binning import pack_bins
        from gsplat_tpu.ops.rasterize_pallas import blend_tiles_pallas

        bins = pack_bins(
            screen, gx, gy, settings.instance_capacity, settings.tile,
            settings.tight_cull, packet_dtype=settings.packet_dtype,
        )
        out = blend_tiles_pallas(
            screen, bins, gx, gy, settings.tile,
            track_contrib=settings.track_contrib,
            blend_mode=settings.blend_mode,
            reduce_pack=settings.packet_dtype == "hybrid",
        )
    else:
        bins = bin_gaussians(
            screen, gx, gy, settings.instance_capacity, settings.tile,
            settings.tight_cull,
        )
        if settings.blend_mode == "oit":
            from gsplat_tpu.ops.rasterize_jnp import blend_tiles_oit_jnp

            out = blend_tiles_oit_jnp(
                screen, bins, gx, gy, settings.tile, settings.max_per_tile,
                settings.chunk,
            )
        else:
            out = blend_tiles_jnp(
                screen, bins, gx, gy, settings.tile, settings.max_per_tile,
                settings.chunk,
            )

    bg = jnp.asarray(bg, jnp.float32)
    color = out.color + out.final_t[..., None] * bg[None, None, :]
    image = tiles_to_image(color, gx, gy, settings.tile, camera.width, camera.height)
    invdepth = tiles_to_image(
        out.invdepth, gx, gy, settings.tile, camera.width, camera.height
    )
    final_t = tiles_to_image(
        out.final_t, gx, gy, settings.tile, camera.width, camera.height
    )

    if exposure is not None:
        image = jnp.einsum("hwc,cd->hwd", image, exposure[:3, :3],
                           precision=jax.lax.Precision.HIGHEST) + exposure[:3, 3]

    image = jnp.clip(image, 0.0, 1.0)

    return {
        "render": image,
        "invdepth": invdepth,
        "final_t": final_t,
        "radii": screen.radius,
        "visibility": screen.radius > 0,
        "instance_overflow": bins.overflow,
        "tile_overflow": out.overflow,
        "num_instances": bins.num_instances,
    }
