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


@pytree_dataclass
class AlignedBins:
    """Per-tile instance segments padded to 128-aligned starts.

    The Pallas blend kernel streams each tile's instances with HBM->VMEM DMA,
    and Mosaic requires lane offsets divisible by the 128 tiling — the TPU
    analogue of the CUDA kernel's fixed BLOCK_SIZE=256 shared-memory batches
    (`forward.cu:313-342`). Segment tails are padding; `count` holds the true
    per-tile instance count and the kernel masks the tail lanes.
    """

    gauss_id: jax.Array  # (Kp,) int32 gaussian index per padded slot (0 in gaps)
    pad_start: jax.Array  # (T,) int32 128-aligned segment starts
    count: jax.Array  # (T,) int32 true instances per tile
    valid: jax.Array  # (Kp,) bool — slot holds a real instance


def align_tile_segments(bins: TileBins, num_tiles: int, chunk: int = 128) -> AlignedBins:
    """Re-lay the sorted instance list into 128-aligned per-tile segments.

    Scatter-free: each padded slot locates its (tile, rank) with one
    searchsorted over the padded prefix sums, then gathers from the sorted
    list. Capacity of the padded buffer is static:
    instance_capacity + chunk * num_tiles (worst-case tail padding).
    """
    k = bins.gauss_id.shape[0]
    count = bins.tile_end - bins.tile_start  # (T,)
    padded = (count + chunk - 1) // chunk * chunk
    poff_incl = jnp.cumsum(padded)  # inclusive
    pad_start = poff_incl - padded  # exclusive prefix

    kp = k + chunk * num_tiles
    slots = jnp.arange(kp, dtype=jnp.int32)
    t_of = jnp.searchsorted(poff_incl, slots, side="right").astype(jnp.int32)
    t_of = jnp.minimum(t_of, num_tiles - 1)
    r = slots - pad_start[t_of]
    valid = (r < count[t_of]) & (slots < poff_incl[num_tiles - 1])
    src = jnp.minimum(bins.tile_start[t_of] + r, k - 1)
    gid = jnp.where(valid, bins.gauss_id[src], 0)
    return AlignedBins(gauss_id=gid, pad_start=pad_start, count=count, valid=valid)
