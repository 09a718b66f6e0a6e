"""Tile binning: (gaussian, tile)-instance expansion, depth sort, tile ranges.

TPU-native re-design of the reference binning stage
(`cuda_rasterizer/rasterizer_impl.cu:198-341`). The CUDA path prefix-sums
tiles_touched, scatters 64-bit [tileID|depth-bits] keys per instance
(`duplicateWithKeys`), cub-radix-sorts them, and scans for tile ranges.

Here the same result comes from sort-light, scatter-light primitives chosen
for what XLA:TPU executes fast:

1. one small sort: gaussians ordered by view depth (N elements, not K
   instances) — instances inherit depth order from their gaussian, so the
   big instance sort needs only the tile key;
2. gather-expansion of instance slots: each slot finds its owning (depth-
   ordered) gaussian with a scatter+cumsum rank table instead of a
   per-slot binary search (searchsorted lowers to log-N serialized gathers
   on TPU; a cumsum is one memory-bound pass);
3. one large *single-key* stable sort by tile id (stability preserves the
   depth order within each tile — exactly the (tile, depth) lexicographic
   order of the reference's packed radix keys);
4. per-tile [start, end) ranges with two small searchsorteds (T queries).

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


def _rank_table(boundaries, size: int):
    """rank[j] = #entries with boundaries[b] <= j, for j in [0, size).

    Scatter marks at each boundary then one inclusive cumsum — the TPU-fast
    equivalent of searchsorted(boundaries, arange(size), side='right').
    Boundaries >= size are dropped (their entries can't own in-range slots).
    """
    idx = jnp.where(boundaries < size, boundaries, size)
    delta = jnp.zeros((size + 1,), jnp.int32).at[idx].add(1, mode="drop")
    return jnp.cumsum(delta[:size])


def bin_gaussians(screen: ScreenGaussians, grid_x: int, grid_y: int, capacity: int) -> TileBins:
    """Expand Gaussians into depth-sorted per-tile instance lists.

    Pure integer structure: the depth keys order instances but are never
    differentiated (the reference's sort is likewise outside autograd), so
    gradients are cut here — keeps the sorts out of the VJP graph.
    """
    num_tiles = grid_x * grid_y
    screen = jax.tree.map(jax.lax.stop_gradient, screen)
    n = screen.depth.shape[0]

    # --- (1) depth-order the gaussians (small sort: N elements)
    iota = jnp.arange(n, dtype=jnp.int32)
    _, order = jax.lax.sort((screen.depth, iota), num_keys=1, is_stable=True)
    tiles_o = screen.tiles_touched[order].astype(jnp.int32)  # 0 for culled
    rmin_o = screen.rect_min[order]
    rmax_o = screen.rect_max[order]

    cum = jnp.cumsum(tiles_o)  # inclusive
    total = cum[-1]

    # --- (2) slot -> owning depth-ordered gaussian (scatter+cumsum rank)
    slots = jnp.arange(capacity, dtype=jnp.int32)
    owner = jnp.minimum(_rank_table(cum, capacity), n - 1)  # (K,)
    offset = cum[owner] - tiles_o[owner]  # exclusive prefix for the owner
    local = slots - offset  # which of the owner's tiles this slot is

    rmin = rmin_o[owner]  # (K, 2)
    rect_w = jnp.maximum(rmax_o[owner][:, 0] - rmin[:, 0], 1)
    tx = rmin[:, 0] + local % rect_w
    ty = rmin[:, 1] + local // rect_w
    tile_id = ty * grid_x + tx

    valid = slots < jnp.minimum(total, capacity)
    tile_key = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)
    gid = jnp.where(valid, order[owner], 0).astype(jnp.int32)

    # --- (3) single-key stable sort by tile: slots are emitted in global
    # depth order, so stability gives (tile, depth) lexicographic order —
    # the reference's radix key order (`rasterizer_impl.cu:303-311`).
    tile_sorted, gauss_sorted = jax.lax.sort(
        (tile_key, gid), num_keys=1, is_stable=True
    )

    # --- (4) per-tile ranges (T small queries)
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

    Scatter-free on the data path: each padded slot locates its (tile, rank)
    with a scatter+cumsum tile table, then gathers from the sorted list.
    Capacity of the padded buffer is static:
    instance_capacity + chunk * num_tiles (worst-case tail padding).
    """
    k = bins.gauss_id.shape[0]
    count = bins.tile_end - bins.tile_start  # (T,)
    padded = (count + chunk - 1) // chunk * chunk
    poff_incl = jnp.cumsum(padded)  # inclusive
    pad_start = poff_incl - padded  # exclusive prefix

    kp = k + chunk * num_tiles
    slots = jnp.arange(kp, dtype=jnp.int32)
    # t_of[j] = index of the tile whose padded segment holds slot j:
    # #tiles with pad_start <= j, minus 1 (empty tiles stack marks — their
    # zero-length segments are skipped by the cumsum jump).
    t_of = jnp.minimum(_rank_table(pad_start, kp) - 1, num_tiles - 1)
    r = slots - pad_start[t_of]
    valid = (r < count[t_of]) & (slots < poff_incl[num_tiles - 1])
    src = jnp.minimum(bins.tile_start[t_of] + r, k - 1)
    gid = jnp.where(valid, bins.gauss_id[src], 0)
    return AlignedBins(gauss_id=gid, pad_start=pad_start, count=count, valid=valid)
