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

    # --- (1) depth-order the gaussians (small sort: N elements); culled rows
    # have tiles_touched == 0 and contribute nothing to the expansion
    iota = jnp.arange(n, dtype=jnp.int32)
    _, order = jax.lax.sort((screen.depth, iota), num_keys=1, is_stable=True)
    # one packed row-gather for all per-gaussian attributes (see below)
    pre = jnp.concatenate(
        [screen.tiles_touched[:, None].astype(jnp.int32), screen.rect_min,
         screen.rect_max[:, 0:1]],
        axis=1,
    )  # (N, 4): tiles, rmin_x, rmin_y, rmax_x
    pre_o = pre[order]  # (N, 4)
    tiles_o = pre_o[:, 0]
    rmin_o = pre_o[:, 1:3]
    rmax_o = pre_o[:, 3:4]

    cum = jnp.cumsum(tiles_o)  # inclusive
    total = cum[-1]

    # --- (2) slot -> owning depth-ordered gaussian (scatter+cumsum rank)
    #
    # All per-owner attributes ride ONE packed row-gather. XLA:TPU runs a
    # lone row-gather at HBM bandwidth, but several scalar gathers fused into
    # one computation serialize (measured 130ms vs 0.1ms for the same bytes
    # at 1080p scale) — so never gather column-by-column here.
    slots = jnp.arange(capacity, dtype=jnp.int32)
    owner = jnp.minimum(_rank_table(cum, capacity), n - 1)  # (K,)
    packed = jnp.stack(
        [cum - tiles_o, rmin_o[:, 0], rmin_o[:, 1],
         jnp.maximum(rmax_o[:, 0] - rmin_o[:, 0], 1), order],
        axis=1,
    )  # (N, 5): excl-prefix, rmin_x, rmin_y, rect_w, gaussian id
    rows = packed[owner]  # (K, 5) single row-gather
    local = slots - rows[:, 0]  # which of the owner's tiles this slot is

    rect_w = rows[:, 3]
    tx = rows[:, 1] + local % rect_w
    ty = rows[:, 2] + local // rect_w
    tile_id = ty * grid_x + tx

    valid = slots < jnp.minimum(total, capacity)
    tile_key = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)
    gid = jnp.where(valid, rows[:, 4], 0).astype(jnp.int32)

    # --- (3) single-key stable sort by tile: slots are emitted in global
    # depth order, so stability gives (tile, depth) lexicographic order —
    # the reference's radix key order (`rasterizer_impl.cu:303-311`).
    tile_sorted, gauss_sorted = jax.lax.sort(
        (tile_key, gid), num_keys=1, is_stable=True
    )

    # --- (4) per-tile ranges: one searchsorted over T+1 boundary queries
    # (end[t] == start[t+1] because the sorted keys are tile-contiguous)
    tile_ids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(tile_sorted, tile_ids, side="left").astype(jnp.int32)
    start = bounds[:num_tiles]
    end = bounds[1:]

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
    nchunks = (count + chunk - 1) // chunk  # (T,) chunks per tile
    coff_incl = jnp.cumsum(nchunks)  # inclusive, in chunk units
    chunk_start = coff_incl - nchunks  # exclusive prefix
    total_chunks = coff_incl[num_tiles - 1]

    # Everything below runs at CHUNK granularity (Kc = Kp/chunk ~ 40k at
    # 1080p) except one row-contiguous gather — per-slot rank tables and
    # column gathers at Kp scale serialize on TPU (see bin_gaussians).
    kc = (k + chunk - 1) // chunk + num_tiles
    cidx = jnp.arange(kc, dtype=jnp.int32)
    c_of = jnp.minimum(_rank_table(chunk_start, kc) - 1, num_tiles - 1)  # (Kc,)
    packed = jnp.stack([chunk_start, bins.tile_start, count], axis=1)  # (T, 3)
    rows = packed[c_of]  # (Kc, 3) small row-gather
    r_chunk = cidx - rows[:, 0]  # chunk rank within its tile
    src0 = rows[:, 1] + r_chunk * chunk  # source offset in the sorted list
    rem = rows[:, 2] - r_chunk * chunk  # true instances left in this chunk

    lane = jnp.arange(chunk, dtype=jnp.int32)
    # slice-shaped gather (gather with slice_sizes=(chunk,)): Kc slices of
    # `chunk` contiguous elements — NOT a (Kc, chunk) index gather, which
    # XLA:TPU executes as Kc*chunk independent scalar gathers (~17ns each)
    ga_pad = jnp.pad(bins.gauss_id, (0, chunk))  # keeps tail slices in-bounds
    # (dynamic_slice clamps out-of-range starts, which would shift the
    # lane <-> instance correspondence for the last real chunk)
    gid2d = jax.vmap(
        lambda s: jax.lax.dynamic_slice(ga_pad, (jnp.maximum(s, 0),), (chunk,))
    )(src0)  # (Kc, chunk)
    valid2d = (lane[None, :] < rem[:, None]) & (cidx < total_chunks)[:, None]
    gid2d = jnp.where(valid2d, gid2d, 0)

    return AlignedBins(
        gauss_id=gid2d.reshape(-1),
        pad_start=chunk_start * chunk,
        count=count,
        valid=valid2d.reshape(-1),
    )
