"""Tile binning: (gaussian, tile)-instance expansion, depth sort, tile ranges.

TPU-native re-design of the reference binning stage
(`cuda_rasterizer/rasterizer_impl.cu:198-341`): where the CUDA path does
cub::InclusiveSum over tiles_touched, a scatter kernel `duplicateWithKeys`
emitting 64-bit [tileID | depth-bits] keys, a cub radix sort, and an
`identifyTileRanges` kernel, we instead:

1. prefix-sum tiles_touched (XLA cumsum),
2. *gather*-expand: each instance slot finds its owning Gaussian with a
   searchsorted over the inclusive prefix sum — a static-shape, scatter-free
   formulation that XLA vectorizes cleanly (scatters serialize on TPU),
3. lexicographically sort (tile_id, depth) with `jax.lax.sort` (stable,
   multi-operand — no 64-bit key packing needed),
4. compute per-tile [start, end) ranges with two searchsorteds.

The instance buffer has static capacity; overflow is returned as a count the
caller can check (the reference instead resizes device buffers dynamically,
`rasterize_points.cu:27-33`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsplat_tpu.core.types import pytree_dataclass
from gsplat_tpu.ops.projection import ScreenGaussians


@pytree_dataclass
class TileBins:
    """Sorted (gaussian, tile) instances + per-tile ranges (BinningState analogue)."""

    gauss_id: jax.Array  # (K,) int32 gaussian index per sorted instance
    tile_id: jax.Array  # (K,) int32 tile per sorted instance (num_tiles = invalid)
    tile_start: jax.Array  # (T,) int32 range start per tile
    tile_end: jax.Array  # (T,) int32 range end per tile
    num_instances: jax.Array  # () int32 total emitted (pre-clamp)
    overflow: jax.Array  # () int32 instances dropped due to capacity


def bin_gaussians(screen: ScreenGaussians, grid_x: int, grid_y: int, capacity: int) -> TileBins:
    """Expand Gaussians into depth-sorted per-tile instance lists."""
    num_tiles = grid_x * grid_y
    tiles = screen.tiles_touched.astype(jnp.int32)  # 0 for culled
    cum = jnp.cumsum(tiles)  # inclusive
    total = cum[-1]

    slots = jnp.arange(capacity, dtype=jnp.int32)
    # Owner of slot j: first gaussian whose inclusive cumsum exceeds j.
    owner = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32)
    owner = jnp.minimum(owner, tiles.shape[0] - 1)
    offset = cum[owner] - tiles[owner]  # exclusive prefix for the owner
    local = slots - offset  # which of the owner's tiles this slot is

    rmin = screen.rect_min[owner]  # (K, 2)
    rmax = screen.rect_max[owner]
    rect_w = jnp.maximum(rmax[:, 0] - rmin[:, 0], 1)
    tx = rmin[:, 0] + local % rect_w
    ty = rmin[:, 1] + local // rect_w
    tile_id = ty * grid_x + tx

    valid = slots < jnp.minimum(total, capacity)
    tile_key = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)
    depth_key = jnp.where(valid, screen.depth[owner], jnp.inf).astype(jnp.float32)

    # Stable lexicographic (tile, depth) sort — the lax.sort analogue of the
    # cub radix SortPairs on packed [tile|depth-bits] keys.
    tile_sorted, _depth_sorted, gauss_sorted = jax.lax.sort(
        (tile_key, depth_key, owner), num_keys=2, is_stable=True
    )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(tile_sorted, tile_ids, side="left").astype(jnp.int32)
    end = jnp.searchsorted(tile_sorted, tile_ids, side="right").astype(jnp.int32)

    return TileBins(
        gauss_id=gauss_sorted,
        tile_id=tile_sorted,
        tile_start=start,
        tile_end=end,
        num_instances=total,
        overflow=jnp.maximum(total - capacity, 0),
    )
