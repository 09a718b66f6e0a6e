"""Pallas TPU kernels for the front-to-back tile blend (fwd + custom VJP bwd).

TPU-native re-design of the CUDA blend kernels (`forward.cu:277-400`,
`backward.cu:453-638`). The CUDA shape — one 16x16-thread block per tile,
cooperative 256-wide shared-memory staging, per-pixel sequential walk with
early exit — becomes, per tile (one pallas grid step):

- pixels live on the 256 sublanes, gaussians on the 128 lanes of the VPU;
- the tile's sorted instance range [start, end) is streamed from HBM in
  128-instance packets with double-buffered async DMA (the VMEM analogue of
  the CUDA shared-memory staging loop / GS-IRON's depth-2 ObjectFifos).
  Packets are 128-ALIGNED WINDOWS of the unaligned sorted instance buffer —
  the kernel masks head lanes (< start) and tail lanes (>= end) instead of
  re-laying the instances into aligned per-tile segments, because every
  capacity-proportional pass (the pack row-gather, the backward scatter)
  pays ~17ns/row and alignment padding inflated the buffer by a third;
- the transmittance recurrence T_{j+1} = T_j (1 - a_j) becomes an inclusive
  lane-axis cumprod via 7 doubling roll+multiply VPU steps (no
  transcendentals, no serial dependency), and color accumulation is a
  (256,128)x(128,4) matmul;
- the 1e-4 early-stop is the mask "raw inclusive transmittance >= 1e-4",
  exact because the stop is permanent and raw == effective transmittance on
  the blended prefix (see rasterize_jnp.py);
- the backward pass re-walks the chunks in forward order, turning the CUDA
  back-to-front `accum_rec` recurrence (`backward.cu:585-589`) into the
  algebraically-identical suffix sum S_total - prefix (computed with the same
  doubling-shift cumsum), and writes *per-instance* gradients; the scatter-add
  into per-gaussian gradients (CUDA atomicAdd, `backward.cu:593-635`) becomes
  a sorted `segment_sum` outside the kernel. A window chunk shared between
  two adjacent tiles (a range ending mid-chunk) is handed to the next tile
  as a VMEM carry and written once by its last contributor;
- because tile ranges are contiguous, both kernels stream the instance
  buffer as ONE global in-order chunk sequence whose DMA state (SMEM
  cursors) persists across grid invocations — each tile's first chunk is
  already in flight (or resident, when shared) when its invocation starts,
  removing a cold-DMA bubble per tile.

Instance data arrives pre-packed from the fused binning (`binning.pack_bins`,
whose Pallas expand kernel + wide-payload sort produce it without any
per-instance gather): `inst_t` (16, K) — rows [mx, my, conic_a, conic_b,
conic_c, opacity, r, g, b, invz] in gaussian-lane layout — plus per-tile
[start, end) ranges and the sorted instance -> gaussian id map for the
backward's gradient scatter.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsplat_tpu.core.types import pytree_dataclass
from gsplat_tpu.ops.binning import PackedBins, TileBins
from gsplat_tpu.ops.projection import ScreenGaussians
from gsplat_tpu.ops.rasterize_jnp import ALPHA_MAX, ALPHA_MIN, T_EPS, BlendOutput

CHUNK = 128  # gaussians per packet == lane width

# Precision of the in-kernel MXU contractions (color accumulation, gradient
# moments). HIGHEST is the parity default: the MXU's single-pass bf16 DEFAULT
# mode costs ~4e-3 relative error in colors and gradients on hardware (the
# round-2 precision bug). Probes may flip this to measure the fast-math
# headroom — call _make_blend_vjp.cache_clear() / _make_oit_vjp.cache_clear()
# after changing it (the VJP cache does not key on it).
BLEND_PRECISION = jax.lax.Precision.HIGHEST
PPT = 256  # pixels per 16x16 tile

_ROW_MX, _ROW_MY, _ROW_CA, _ROW_CB, _ROW_CC, _ROW_OP = 0, 1, 2, 3, 4, 5
_ROW_FEAT = 6  # rows 6..9: r, g, b, invz
N_ROWS = 16  # padded sublane count for the instance block


def _round_up(x, m):
    return (x + m - 1) // m * m


def _interpret() -> bool:
    # CPU has no Mosaic backend: run the kernels in the Pallas interpreter
    # (tests, the driver's virtual-device mesh dryruns). Trace-time constant.
    return jax.default_backend() == "cpu"


def _cumsum_lanes(x):
    """Inclusive cumsum along the lane axis (axis=1) by doubling shifts.

    Replaces a (256,128)x(128,128) lower-triangular f32 matmul: the MXU is
    bf16-native, so the f32 matmul runs in multiple passes and dominated the
    backward chunk loop; 7 roll+select+add VPU steps are ~10x cheaper and
    accumulate in a tree order (comparable rounding to the MXU's)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    v = x
    s = 1
    while s < CHUNK:
        shifted = pltpu.roll(v, s, axis=1)
        v = v + jnp.where(lane >= s, shifted, 0.0)
        s *= 2
    return v


def _cumprod_lanes(x):
    """Inclusive cumprod along the lane axis (axis=1) by doubling shifts.

    7 roll+select+multiply steps. Chosen over a log-space matmul because the
    TPU's exp/log are low-precision approximations — compounded over hundreds
    of blended gaussians per pixel they cost ~1e-3 of absolute color error,
    while plain multiplies stay at f32 rounding (~1e-7)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    v = x
    s = 1
    while s < CHUNK:
        shifted = pltpu.roll(v, s, axis=1)  # shifted[l] = v[l-s] (wraps; masked)
        v = v * jnp.where(lane >= s, shifted, 1.0)
        s *= 2
    return v


def _pixel_coords(first_tile, grid_x, tile, rows=PPT):
    """(rows,1) pixel-center x/y for rows//PPT consecutive row-major tiles.

    With rows == PPT this is one tile's 256 pixels; with rows == pair*PPT the
    paired kernels stack `pair` adjacent tiles' pixels on the sublane axis
    (tile i occupies rows [i*PPT, (i+1)*PPT))."""
    lin = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    tix = first_tile + lin // PPT
    loc = lin % PPT
    px = ((tix % grid_x) * tile + loc % tile).astype(jnp.float32)
    py = ((tix // grid_x) * tile + loc // tile).astype(jnp.float32)
    return px, py


def _range_cols(start_ref, end_ref, first, pair, rows):
    """(rows,1) per-row [start, end) of the tile owning each pixel row."""
    lin = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    half = lin // PPT
    s_col = jnp.zeros((rows, 1), jnp.int32)
    e_col = jnp.zeros((rows, 1), jnp.int32)
    for i in range(pair):
        s_col = jnp.where(half == i, start_ref[first + i], s_col)
        e_col = jnp.where(half == i, end_ref[first + i], e_col)
    return s_col, e_col


def _pair_bases(first, grid_x, tile, pair, px, py):
    """Per-tile origins and block-diagonal local pixel-basis columns for a
    pair of adjacent tiles, shared by the sorted and OIT backward kernels.

    Each tile of the pair gets its OWN 6 basis columns [1, x, y, x^2, xy,
    y^2] in tile-local coordinates, masked to its rows — so ONE moment
    matmul yields every tile's moments against its own origin (mixing
    origins in one contraction would break the recombination, and per-tile
    matmuls would double the dispatch count). Tile origins are exact small
    ints."""
    half = jax.lax.broadcasted_iota(jnp.int32, (px.shape[0], 1), 0) // PPT
    oxs, oys, cols = [], [], []
    for i in range(pair):
        tix = first + i
        oxi = ((tix % grid_x) * tile).astype(jnp.float32)
        oyi = ((tix // grid_x) * tile).astype(jnp.float32)
        oxs.append(oxi)
        oys.append(oyi)
        m = half == i
        one = jnp.where(m, 1.0, 0.0)
        pxl = jnp.where(m, px - oxi, 0.0)  # in [0, tile) on this tile's rows
        pyl = jnp.where(m, py - oyi, 0.0)
        cols += [one, pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl]
    return oxs, oys, cols


def _drain_writes(cur, wr_wait):
    """Wait out the (up to _WBUF) gradient writes still in flight — the
    final grid invocation of both backward kernels must call this."""
    w = cur[_WCNT]
    for j in range(1, _WBUF + 1):
        @pl.when(w >= j)
        def _(j=j):
            wr_wait((w - j) % _WBUF)


def _chunk_blend(blk, px, py, t_raw, lo, hi):
    """Shared fwd/bwd per-chunk math. Returns dict of (256,128) quantities.

    `lo`/`hi` bound the valid lanes of this 128-aligned window chunk: lanes
    < lo belong to the previous tile's range, lanes >= hi to the next one's
    (or padding); both blend as alpha = 0.

    The packet's conic rows arrive PRE-FOLDED as [-ca/2, -cb, -cc/2]
    (pack-time exact power-of-two/negation scalings, `binning.pack_bins`),
    so the quadratic needs no -0.5 multiply; the association order below
    keeps `power` bitwise identical to -0.5*(ca dx^2 + cc dy^2) - cb dx dy
    (`forward.cu:336-339`)."""
    blk = blk.astype(jnp.float32)  # no-op for f32 packets; upcast for bf16
    mx = blk[_ROW_MX : _ROW_MX + 1, :]
    my = blk[_ROW_MY : _ROW_MY + 1, :]
    ca = blk[_ROW_CA : _ROW_CA + 1, :]  # folded: -conic_a/2
    cb = blk[_ROW_CB : _ROW_CB + 1, :]  # folded: -conic_b
    cc = blk[_ROW_CC : _ROW_CC + 1, :]  # folded: -conic_c/2
    op = blk[_ROW_OP : _ROW_OP + 1, :]

    dx = mx - px  # (rows,128)
    dy = my - py
    power = (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    lane = jax.lax.broadcasted_iota(jnp.int32, (px.shape[0], CHUNK), 1)
    # one unsigned compare replaces (lane >= lo) & (lane < hi); lo/hi may be
    # scalars or (rows,1) columns (paired kernels: per-row tile ranges). A
    # chunk wholly outside one row's range yields no valid lanes (lane - lo
    # wraps for lo > lane; lane - lo >= hi - lo for lo <= lane beyond hi)
    valid = (lane - lo).astype(jnp.uint32) < (hi - lo).astype(jnp.uint32)
    g = jnp.exp(power)
    alpha = jnp.minimum(op * g, ALPHA_MAX)
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & valid
    alpha = jnp.where(keep, alpha, 0.0)

    one_m = 1.0 - alpha
    cp_incl = _cumprod_lanes(one_m)  # (256,128) inclusive cumprod of (1-alpha)
    t_incl = t_raw * cp_incl
    blended = t_incl >= T_EPS
    alpha_eff = jnp.where(blended, alpha, 0.0)
    # exclusive cumprod = inclusive shifted right one lane (lane 0 -> 1);
    # replaces a (256,128) divide per chunk (t_incl/one_m) and is the more
    # accurate form: the true product of the preceding (1-alpha), not the
    # division's rounded reconstruction of it
    cp_excl = jnp.where(lane >= 1, pltpu.roll(cp_incl, 1, axis=1), 1.0)
    t_excl = t_raw * cp_excl
    w = alpha_eff * t_excl

    return dict(
        dx=dx, dy=dy, power=power, g=g, alpha=alpha, keep=keep,
        blended=blended, alpha_eff=alpha_eff, t_excl=t_excl, w=w,
        t_raw_next=t_raw * cp_incl[:, CHUNK - 1 : CHUNK],
        # prod over blended (1-alpha) == cp_incl at the last blended lane
        # (blended is a prefix and cp_incl is non-increasing) == min over
        # blended lanes; Mosaic has no reduce_prod.
        eff_prod=jnp.min(
            jnp.where(blended, cp_incl, 1.0), axis=1, keepdims=True
        ),
        ca=ca, cb=cb, cc=cc, op=op, mx=mx, my=my,
    )


# ----------------------------------------------------------------------------
# forward kernel
# ----------------------------------------------------------------------------


# streaming depth: chunks of read lookahead / outstanding gradient writes.
# One chunk's blend compute (~0.5-1.5us) is comparable to one DMA's latency
# (~1us), so a depth-2 pipeline stalls on the DMA tail; depth 4 hides it.
_NBUF = 4
_WBUF = 4

# gaussian-axis unroll: consecutive instance chunks blended per while-loop
# trip (round-5 probe; see _fwd_kernel/_bwd_kernel live_body). 1 = the
# round-4 shape; 2 halves the loop/protocol overhead and exposes chunk-level
# ILP at the cost of unroll-chunk early-stop granularity.
FWD_UNROLL = 1
BWD_UNROLL = 1

# early-stop drain mode: True = settle in-flight reads + cursor jump +
# next-pair prefetch (round 5); False = the round-4 issue+wait-every-chunk
# drain, kept probe-able for on-chip attribution (scripts/probe_r5_unroll).
FAST_DRAIN = True


def _read_protocol(inst_ref, scr, sems, cur, nctotal):
    """Cross-invocation streaming reads of the instance buffer.

    Tile ranges are contiguous, so the union of all tiles' window chunks is
    simply chunks [0, nctotal) of `inst_ref`, consumed in order. Two SMEM
    cursors persist across grid steps: cur[0] = first chunk not yet waited
    (chunks below it are resident in their g%_NBUF slot or already
    consumed), cur[1] = first chunk not yet issued. Keeping the stream
    global removes the cold-DMA bubble every tile otherwise pays on its
    first chunk (~1us x num_tiles), and a boundary chunk shared by two
    tiles is fetched ONCE and re-read from VMEM by the second tile."""

    def issue(g):
        off = pl.multiple_of(g * CHUNK, CHUNK)
        pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(off, CHUNK)], scr.at[g % _NBUF], sems.at[g % _NBUF]
        ).start()

    def init(t):
        @pl.when(t == 0)
        def _():
            @pl.when(nctotal > 0)
            def _():
                issue(0)

            cur[0] = 0
            cur[1] = jnp.minimum(nctotal, 1)

    def fetch(g):
        """Ensure chunk g is resident; keep up to _NBUF-1 chunks in flight
        ahead of it. Chunk g+_NBUF is the one that reuses slot g's buffer
        ((g+_NBUF) % _NBUF == g % _NBUF), and it is first issued from
        fetch(g+1) — after chunk g has been consumed, so sequential
        consumption guarantees the reuse is safe. Returns the VMEM slot
        holding chunk g."""

        def issue_body(nxt):
            issue(nxt)
            cur[1] = nxt + 1
            return nxt + 1

        # start at max(cursor, g): after a drain_reads() skip (early stop)
        # the chunks in [cursor, g) belong to no remaining tile — jump over
        # them instead of issuing DMAs nobody will wait on. All slots are
        # free at that point (drain_reads waited every in-flight read), so
        # the jump cannot land on a busy buffer.
        jax.lax.while_loop(
            lambda nxt: (nxt < nctotal) & (nxt <= g + _NBUF - 1),
            issue_body,
            jnp.maximum(cur[1], g),
        )

        @pl.when(cur[0] <= g)
        def _():
            off = pl.multiple_of(g * CHUNK, CHUNK)
            pltpu.make_async_copy(
                inst_ref.at[:, pl.ds(off, CHUNK)],
                scr.at[g % _NBUF],
                sems.at[g % _NBUF],
            ).wait()
            cur[0] = g + 1

        return scr[g % _NBUF]

    def drain_reads(next_base=None):
        """Early-stop fast path: wait out the (<= _NBUF-1) reads still in
        flight and mark them consumed — instead of issuing + waiting a DMA
        for EVERY remaining chunk of the tile's range (the round-4 drain
        loop, pure protocol traffic for data nobody reads). The next
        tile's fetch() jumps the issue cursor over the skipped gap; with
        `next_base` the skipped tail's lookahead is respent prefetching
        the next tile's first chunks so it starts warm, like the round-4
        drain left it."""

        def wait_body(g2):
            pltpu.make_async_copy(
                inst_ref.at[:, pl.ds(pl.multiple_of(g2 * CHUNK, CHUNK), CHUNK)],
                scr.at[g2 % _NBUF],
                sems.at[g2 % _NBUF],
            ).wait()
            return g2 + 1

        jax.lax.while_loop(lambda g2: g2 < cur[1], wait_body, cur[0])
        cur[0] = cur[1]
        if next_base is not None:
            def issue_body(nxt):
                issue(nxt)
                cur[1] = nxt + 1
                return nxt + 1

            jax.lax.while_loop(
                lambda nxt: (nxt < nctotal) & (nxt <= next_base + _NBUF - 2),
                issue_body,
                jnp.maximum(cur[1], next_base),
            )

    return init, fetch, drain_reads


def _fwd_kernel(grid_x, tile, pair, track_contrib, unroll, start_ref, end_ref,
                inst_ref, out_ref, scr, sems, cur):
    # instance packets may be bf16 (half the DMA traffic, the GS-IRON bf16
    # ladder analogue); all blend math runs f32
    #
    # With pair > 1 each grid step blends `pair` ADJACENT row-major tiles on
    # pair*256 sublanes: tile ranges are contiguous (binning builds them from
    # one searchsorted over boundary queries), so the pair's union range
    # [start[first], end[first+pair-1]) is one contiguous window of the same
    # global chunk stream, each chunk blended against all pair*256 pixels
    # with per-row [s, e) lane masks. Halves the chunk-loop trip count and
    # per-op issue overhead; the cost is pair-level (not tile-level) early
    # stop granularity.
    p = pl.program_id(0)
    num_pairs = pl.num_programs(0)
    first = p * pair
    rows = pair * PPT
    s = start_ref[first]
    e = end_ref[first + pair - 1]
    base = s // CHUNK  # first 128-aligned window chunk covering [s, e)
    nch = jnp.where(e > s, pl.cdiv(e, CHUNK) - base, 0)
    nctotal = pl.cdiv(end_ref[num_pairs * pair - 1], CHUNK)
    px, py = _pixel_coords(first, grid_x, tile, rows)
    s_col, e_col = _range_cols(start_ref, end_ref, first, pair, rows)

    init, fetch, drain_reads = _read_protocol(inst_ref, scr, sems, cur, nctotal)
    init(p)

    # Tile-level early stop (the vector analogue of the CUDA per-pixel `done`
    # break, forward.cu:345-385): the live while-loop blends chunks until
    # EVERY pixel's raw transmittance is below T_EPS (past that point no
    # remaining instance can blend), then a drain loop keeps ONLY the fetch
    # protocol running — the global chunk stream must consume every chunk in
    # order regardless.
    def live_cond(st):
        ci, t_raw, _, _, _ = st
        return (ci < nch) & (jnp.max(t_raw) >= T_EPS)

    def blend_one(g, t_raw, accum, ncon, e_lim):
        """Blend window chunk g; e_lim <= e_col masks an absent unroll mate
        (e_lim == s_col -> zero valid lanes, a no-op blend)."""
        blk = fetch(g).astype(jnp.float32)  # (16, 128)
        woff = g * CHUNK
        q = _chunk_blend(blk, px, py, t_raw, s_col - woff, e_lim - woff)
        feat_t = blk[_ROW_FEAT : _ROW_FEAT + 4, :]  # (4,128): r,g,b,invz
        # HIGHEST precision: the MXU's default single-pass bf16 matmul costs
        # ~4e-3 relative error in the accumulated color on hardware (the CPU
        # interpreter hides it); these matmuls are tiny, the passes are free
        accum = accum + jax.lax.dot_general(
            q["w"], feat_t, (((1,), (1,)), ((), ())),
            precision=BLEND_PRECISION,
            preferred_element_type=jnp.float32,
        )  # (rows, 4)
        if track_contrib:
            # last_contributor (forward.cu:347-384): 1-based index within the
            # tile's range of the last instance actually blended at this pixel
            lane = jax.lax.broadcasted_iota(jnp.int32, (rows, CHUNK), 1)
            pos = (lane + (woff + 1) - s_col).astype(jnp.float32)  # ints < 2^24
            ncon = jnp.maximum(
                ncon,
                jnp.max(
                    jnp.where(q["alpha_eff"] > 0.0, pos, 0.0), axis=1, keepdims=True
                ),
            )
        return q["t_raw_next"], q["eff_prod"], accum, ncon

    def live_body(st):
        ci, t_raw, t_eff, accum, ncon = st
        g = base + ci
        t_raw, effp, accum, ncon = blend_one(g, t_raw, accum, ncon, e_col)
        t_eff = t_eff * effp
        # gaussian-axis unroll: blend `unroll` consecutive chunks per loop
        # trip. Chunk k's dx/power/exp/alpha/cumprod are fully independent
        # of chunk k-1 (only the t_raw product chain is serial), so the
        # unrolled body exposes ~2x vector-op ILP and halves the loop /
        # fetch-protocol overhead. An absent mate (range end) degenerates
        # to a masked re-blend of the LAST chunk with zero valid lanes —
        # fetch(g) of a consumed chunk is a pure VMEM re-read, never a DMA.
        for k in range(1, unroll):
            has_k = ci + k < nch
            gk = jnp.minimum(g + k, base + jnp.maximum(nch, 1) - 1)
            e_lim = jnp.where(has_k, e_col, s_col)
            t_raw, effp, accum, ncon = blend_one(gk, t_raw, accum, ncon, e_lim)
            t_eff = t_eff * effp
        return ci + unroll, t_raw, t_eff, accum, ncon

    # rows of an empty tile in the pair start saturated (t_raw = 0) so they
    # never hold the pair's early stop open; their outputs don't read t_raw
    ci, t_raw, t_eff, accum, ncon = jax.lax.while_loop(
        live_cond,
        live_body,
        (
            jnp.int32(0),
            (e_col > s_col).astype(jnp.float32),
            jnp.ones((rows, 1), jnp.float32),
            jnp.zeros((rows, 4), jnp.float32),
            jnp.zeros((rows, 1), jnp.float32),
        ),
    )

    # early-stop fast drain: the skipped tail chunks are read by no one —
    # settle the in-flight DMAs and jump the cursors instead of issuing +
    # waiting a DMA per remaining chunk (round-4 behavior; pure overhead,
    # several ms/frame on converged scenes with saturated pixels), then
    # respend the lookahead prefetching the next pair's first chunks
    if FAST_DRAIN:
        next_base = jnp.where(
            p + 1 < num_pairs,
            start_ref[jnp.minimum((p + 1) * pair, num_pairs * pair - 1)] // CHUNK,
            nctotal,
        )

        @pl.when(ci < nch)
        def _():
            drain_reads(next_base)
    else:
        def drain_body(i, _):
            fetch(base + i)
            return 0

        jax.lax.fori_loop(ci, nch, drain_body, 0)

    out_ref[0, :, 0:4] = accum
    out_ref[0, :, 4:5] = t_eff
    out_ref[0, :, 5:6] = ncon
    out_ref[0, :, 6:8] = jnp.zeros((rows, 2), jnp.float32)


def _pad_ranges(tile_start, tile_end, num_tiles, pair):
    """Pad the per-tile range arrays to a multiple of `pair` with empty
    tail tiles [total, total) so every pair's union stays contiguous."""
    num_pad = _round_up(num_tiles, pair)
    if num_pad != num_tiles:
        total = tile_end[num_tiles - 1]
        ext = jnp.broadcast_to(total, (num_pad - num_tiles,))
        tile_start = jnp.concatenate([tile_start[:num_tiles], ext])
        tile_end = jnp.concatenate([tile_end[:num_tiles], ext])
    return tile_start, tile_end, num_pad


def _run_forward(inst_t, tile_start, tile_end, grid_x, grid_y, tile,
                 track_contrib=False, pair=1, unroll=None):
    num_tiles = grid_x * grid_y
    tile_start, tile_end, num_pad = _pad_ranges(tile_start, tile_end, num_tiles, pair)
    kernel = functools.partial(
        _fwd_kernel, grid_x, tile, pair, track_contrib,
        FWD_UNROLL if unroll is None else unroll,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_pad // pair,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, pair * PPT, 8), lambda t, s, e: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, N_ROWS, CHUNK), inst_t.dtype),
            pltpu.SemaphoreType.DMA((_NBUF,)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_pad // pair, pair * PPT, 8), jnp.float32),
        interpret=_interpret(),
    )(tile_start, tile_end, inst_t)
    # (pairs, pair*256, 8) -> (tiles, 256, 8): a row-major-compatible reshape
    return out.reshape(num_pad, PPT, 8)[:num_tiles]


# ----------------------------------------------------------------------------
# backward kernel
# ----------------------------------------------------------------------------


# SMEM cursor indices for the backward kernel's cross-invocation state
_RD0, _RD1 = 0, 1  # read-protocol cursors (see _read_protocol)
_PEND = 2  # 1 -> carry_scr holds grads of a boundary chunk awaiting its next tile
_WCNT = 3  # number of gradient-chunk writes issued so far
_WCH0 = 4  # chunk index of the write in flight per slot (4, 5)


def _make_emit(nch, e, total, dinst_ref, grad_scr, carry_scr, out_sems, cur):
    """Carry/hold/write protocol for per-chunk gradient blocks, shared by the
    sorted and OIT backward kernels (see _bwd_kernel's docstrings)."""

    def wr_wait(slot):
        g_prev = cur[_WCH0 + slot]
        pltpu.make_async_copy(
            grad_scr.at[slot],
            dinst_ref.at[:, pl.ds(pl.multiple_of(g_prev * CHUNK, CHUNK), CHUNK)],
            out_sems.at[slot],
        ).wait()

    def emit(ci, g, grads):
        # a boundary chunk shared with the PREVIOUS tile arrives as a VMEM
        # carry, not an HBM read-modify-write (which would stall every tile
        # on a full HBM round trip). NaN-safe: where() selects, never reads
        # through, on the untaken branch (carry_scr starts uninitialized).
        take_carry = (ci == 0) & (cur[_PEND] == 1)
        grads = grads + jnp.where(take_carry, carry_scr[...], 0.0)
        # if OUR range ends mid-chunk and later instances exist, the NEXT
        # non-empty tile also contributes to this chunk: hand the grads over
        # instead of writing them
        hold = (ci == nch - 1) & (e % CHUNK != 0) & (e < total)

        @pl.when(hold)
        def _():
            carry_scr[...] = grads
            cur[_PEND] = 1

        @pl.when(jnp.logical_not(hold))
        def _():
            w = cur[_WCNT]
            slot = w % _WBUF

            @pl.when(w >= _WBUF)
            def _():
                wr_wait(slot)

            grad_scr[slot] = grads
            pltpu.make_async_copy(
                grad_scr.at[slot],
                dinst_ref.at[:, pl.ds(pl.multiple_of(g * CHUNK, CHUNK), CHUNK)],
                out_sems.at[slot],
            ).start()
            cur[_WCH0 + slot] = g
            cur[_WCNT] = w + 1

        @pl.when(take_carry & jnp.logical_not(hold))
        def _():
            cur[_PEND] = 0

    return emit, wr_wait


def _bwd_kernel(
    grid_x, tile, pair, unroll, start_ref, end_ref, inst_ref, fwd_ref, dout_ref,
    dinst_ref, scr, grad_scr, carry_scr, sems, out_sems, cur,
):
    # pair > 1: same pairing as the forward (see _fwd_kernel) — `pair`
    # adjacent tiles' pixels share the chunk loop on pair*256 sublanes, and
    # each union chunk's gradient block is emitted ONCE (summed over all
    # pair tiles' pixels), halving both the loop trip count and the
    # emit-protocol traffic.
    p = pl.program_id(0)
    num_pairs = pl.num_programs(0)
    first = p * pair
    rows = pair * PPT
    s = start_ref[first]
    e = end_ref[first + pair - 1]
    base = s // CHUNK
    nch = jnp.where(e > s, pl.cdiv(e, CHUNK) - base, 0)
    total = end_ref[num_pairs * pair - 1]
    nctotal = pl.cdiv(total, CHUNK)
    px, py = _pixel_coords(first, grid_x, tile, rows)
    s_col, e_col = _range_cols(start_ref, end_ref, first, pair, rows)
    oxs, oys, basis_cols = _pair_bases(first, grid_x, tile, pair, px, py)

    dpix = dout_ref[0, :, 0:4]  # (rows,4) cotangents of [r,g,b,invdepth]
    # loop-invariant LHS of the merged moment/feature matmul (see live_body)
    basis_dpix = jnp.concatenate(basis_cols + [dpix], axis=1)  # (rows, 6*pair+4)
    d_tfinal = dout_ref[0, :, 4:5]  # (rows,1) cotangent of final transmittance
    t_final = fwd_ref[0, :, 4:5]  # (rows,1) forward final transmittance
    # S_total_p = sum_k w_k c_k  — recovered from the forward accumulators
    s_total = jnp.sum(fwd_ref[0, :, 0:4] * dpix, axis=1, keepdims=True)  # (rows,1)
    bgdot = d_tfinal * t_final  # background/final-T coupling term

    init, fetch, drain_reads = _read_protocol(inst_ref, scr, sems, cur, nctotal)
    init(p)

    @pl.when(p == 0)
    def _():
        cur[_PEND] = 0
        cur[_WCNT] = 0

    emit, wr_wait = _make_emit(
        nch, e, total, dinst_ref, grad_scr, carry_scr, out_sems, cur
    )

    # Tile-level early stop, mirroring the forward: the live while-loop walks
    # chunks until every pixel saturates (t_raw < T_EPS — past that point
    # every remaining instance's gradient from this tile is exactly zero),
    # then the drain loop keeps the fetch stream and the zero-gradient
    # writes flowing (every chunk must still be written by its last
    # contributing tile).
    def live_cond(st):
        ci, t_raw, _ = st
        return (ci < nch) & (jnp.max(t_raw) >= T_EPS)

    def blend_grad_one(ci, g, t_raw, prefix, e_lim, do_emit):
        """One chunk's gradient block + emit. e_lim < e_col masks an absent
        unroll mate (zero valid lanes); do_emit guards the emit protocol so
        a masked re-blend never double-writes its chunk."""
        blk = fetch(g).astype(jnp.float32)
        woff = g * CHUNK
        q = _chunk_blend(blk, px, py, t_raw, s_col - woff, e_lim - woff)

        feat_t = blk[_ROW_FEAT : _ROW_FEAT + 4, :]  # (4,128)
        # c_{p,j} = sum_ch feat_{ch,j} * dpix_{p,ch} — a K=4 contraction:
        # four VPU broadcast multiply-adds (~0.25us) beat a latency-bound
        # multi-pass HIGHEST matmul (~0.7us; same finding as the rejected
        # K=6 power matmul, docs/PERF_HEADROOM.md)
        c = (
            dpix[:, 0:1] * feat_t[0:1, :]
            + dpix[:, 1:2] * feat_t[1:2, :]
            + dpix[:, 2:3] * feat_t[2:3, :]
            + dpix[:, 3:4] * feat_t[3:4, :]
        )  # (256,128)

        wc = q["w"] * c
        prefix_incl = prefix + _cumsum_lanes(wc)  # (256,128) running sum_{k<=j} w_k c_k
        suffix = s_total - prefix_incl

        gate = q["blended"] & q["keep"]
        inv_one_m = 1.0 / (1.0 - q["alpha"])
        dalpha = jnp.where(
            gate, q["t_excl"] * c - (suffix + bgdot) * inv_one_m, 0.0
        )  # (256,128)

        # chain rule (backward.cu:615-636), true [a,b,c] conic gradients.
        # Every per-instance gradient row is a pixel-sum of dgm times a
        # polynomial in (dx, dy) of degree <= 2 — so instead of building six
        # (256,128) integrands and reducing each (the hottest stretch of the
        # round-1 backward), compute the SIX MOMENTS of dgm against the
        # tile-local pixel basis [1, px, py, px^2, px*py, py^2] with ONE MXU
        # matmul and assemble the rows from them with (1,128) math. Tile-
        # local coordinates keep the mx^2*m0-style terms small so the
        # recombination loses no more than ~1e-5 relative to the direct form.
        dG = q["op"] * dalpha  # (256,128)
        dgm = dG * q["g"]
        # ONE merged HIGHEST matmul computes every tile's six moments of dgm
        # against ITS block-diagonal local basis AND the four feature
        # gradients (separate matmuls were latency-bound: each multi-pass
        # HIGHEST dispatch costs ~0.7us against ~0.1us of extra width)
        both = jax.lax.dot_general(
            basis_dpix,
            jnp.concatenate([dgm, q["w"]], axis=1),  # (rows, 256)
            (((0,), (0,)), ((), ())),
            precision=BLEND_PRECISION,
            preferred_element_type=jnp.float32,
        )  # (6*pair+4, 256): [6i:6i+6, 0:128] = tile i's moments; tail = dfeat
        dfeat = both[6 * pair : 6 * pair + 4, CHUNK : 2 * CHUNK]  # (4,128)
        # per-tile recombination against each tile's own origin; gradient
        # rows are pixel sums, so the pair's blocks simply add
        grad_rows = None
        for i in range(pair):
            mom = both[6 * i : 6 * i + 6, 0:CHUNK]
            m0 = mom[0:1, :]
            mxl = q["mx"] - oxs[i]  # (1,128) tile-local centers
            myl = q["my"] - oys[i]
            s1x = mxl * m0 - mom[1:2, :]  # sum dgm*dx
            s1y = myl * m0 - mom[2:3, :]  # sum dgm*dy
            s2xx = mxl * mxl * m0 - 2.0 * mxl * mom[1:2, :] + mom[3:4, :]
            s2xy = mxl * myl * m0 - mxl * mom[2:3, :] - myl * mom[1:2, :] + mom[4:5, :]
            s2yy = myl * myl * m0 - 2.0 * myl * mom[2:3, :] + mom[5:6, :]
            # d opacity = sum g*dalpha = (sum dgm)/op (op is per-gaussian)
            d_op = m0 / jnp.maximum(q["op"], 1e-30)
            # mean2d gradients from the FOLDED conic rows (ca_f = -ca/2,
            # cb_f = -cb): -(ca s1x + cb s1y) == 2 ca_f s1x + cb_f s1y
            block = jnp.concatenate(
                [
                    (q["ca"] + q["ca"]) * s1x + q["cb"] * s1y,  # d mean2d_x
                    (q["cc"] + q["cc"]) * s1y + q["cb"] * s1x,  # d mean2d_y
                    -0.5 * s2xx,  # d conic_a (true-conic basis)
                    -s2xy,  # d conic_b
                    -0.5 * s2yy,  # d conic_c
                    d_op,  # d opacity
                ],
                axis=0,
            )  # (6,128)
            grad_rows = block if grad_rows is None else grad_rows + block
        pad = jnp.zeros((N_ROWS - 10, CHUNK), jnp.float32)
        grads = jnp.concatenate([grad_rows, dfeat, pad], axis=0)

        @pl.when(do_emit)
        def _():
            emit(ci, g, grads)

        return q["t_raw_next"], prefix_incl[:, CHUNK - 1 : CHUNK]

    def live_body(st):
        ci, t_raw, prefix = st
        t_raw, prefix = blend_grad_one(
            ci, base + ci, t_raw, prefix, e_col, jnp.bool_(True)
        )
        # gaussian-axis unroll (see _fwd_kernel): mate chunks' heavy vector
        # work is independent of each other (only the t_raw/prefix carry
        # columns are serial); an absent mate re-blends the LAST chunk with
        # zero valid lanes and skips emit (each chunk is emitted exactly
        # once, keeping the carry/hold/write protocol's invariants)
        for k in range(1, unroll):
            has_k = ci + k < nch
            gk = jnp.minimum(base + ci + k, base + jnp.maximum(nch, 1) - 1)
            e_lim = jnp.where(has_k, e_col, s_col)
            t_raw, prefix = blend_grad_one(ci + k, gk, t_raw, prefix, e_lim, has_k)
        return ci + unroll, t_raw, prefix

    ci, _, _ = jax.lax.while_loop(
        live_cond,
        live_body,
        (
            jnp.int32(0),
            (e_col > s_col).astype(jnp.float32),
            jnp.zeros((rows, 1), jnp.float32),
        ),
    )

    # early-stop drain: every remaining chunk still needs its ZERO gradient
    # block written (each chunk is written exactly once, by its last
    # contributing tile) — but not its instance data: settle the in-flight
    # reads once, prefetch the next pair's chunks, and let the emit loop
    # run fetch-free.
    if FAST_DRAIN:
        next_base = jnp.where(
            p + 1 < num_pairs,
            start_ref[jnp.minimum((p + 1) * pair, num_pairs * pair - 1)] // CHUNK,
            nctotal,
        )

        @pl.when(ci < nch)
        def _():
            drain_reads(next_base)

        def drain_body(i, _):
            emit(i, base + i, jnp.zeros((N_ROWS, CHUNK), jnp.float32))
            return 0
    else:
        def drain_body(i, _):
            fetch(base + i)
            emit(i, base + i, jnp.zeros((N_ROWS, CHUNK), jnp.float32))
            return 0

    jax.lax.fori_loop(ci, nch, drain_body, 0)

    # every chunk is written exactly once, by its last contributing tile; a
    # pending carry always has a later consumer (e < total). Only the final
    # invocation must drain the writes still in flight.
    @pl.when(p == num_pairs - 1)
    def _():
        _drain_writes(cur, wr_wait)


def _run_backward(inst_t, tile_start, tile_end, fwd_out, dout, grid_x, grid_y,
                  tile, pair=1, unroll=None):
    num_tiles = grid_x * grid_y
    k_pad = inst_t.shape[1]
    tile_start, tile_end, num_pad = _pad_ranges(tile_start, tile_end, num_tiles, pair)
    if num_pad != num_tiles:
        ext = ((0, num_pad - num_tiles), (0, 0), (0, 0))
        fwd_out = jnp.pad(fwd_out, ext)
        dout = jnp.pad(dout, ext)
    fwd_out = fwd_out.reshape(num_pad // pair, pair * PPT, 8)
    dout = dout.reshape(num_pad // pair, pair * PPT, 8)
    kernel = functools.partial(
        _bwd_kernel, grid_x, tile, pair,
        BWD_UNROLL if unroll is None else unroll,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_pad // pair,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # inst_t
            pl.BlockSpec(
                (1, pair * PPT, 8), lambda t, s, e: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, pair * PPT, 8), lambda t, s, e: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # dinst (16, K)
        scratch_shapes=[
            pltpu.VMEM((_NBUF, N_ROWS, CHUNK), inst_t.dtype),
            pltpu.VMEM((_WBUF, N_ROWS, CHUNK), jnp.float32),  # grads stay f32
            pltpu.VMEM((N_ROWS, CHUNK), jnp.float32),  # boundary-chunk carry
            pltpu.SemaphoreType.DMA((_NBUF,)),
            pltpu.SemaphoreType.DMA((_WBUF,)),
            pltpu.SMEM((4 + _WBUF,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_ROWS, k_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(tile_start, tile_end, inst_t, fwd_out, dout)


# ----------------------------------------------------------------------------
# order-independent transmittance (OIT) kernels — opt-in fast mode
# ----------------------------------------------------------------------------
# Weighted-blended OIT adapted to 3DGS (PERF_HEADROOM #4, PAPERS.md): the
# per-pixel front-to-back recurrence is replaced by commutative sums
#   N = sum alpha*invz^2*[r,g,b,invz],  D = sum alpha*invz^2,
#   T = prod (1-alpha)  (accumulated as sum log1p(-alpha))
# so the kernels need NO cumprod/cumsum, no depth-ordering of the instance
# stream, and the backward is per-instance local given (N, D, T) — the
# custom VJP wraps only these raw sums; the quotient/compositing
# (N / max(D,eps) * (1 - T)) runs in plain jnp outside and is autodiffed.
# alpha/keep rules are IDENTICAL to the sorted path. Not reference parity:
# ships as `RenderSettings.blend_mode="oit"`, quality-validated separately.


def _oit_alpha(blk, px, py, lo, hi):
    """alpha/keep math shared with the sorted path's _chunk_blend (folded
    conic packets, unsigned lane-validity compare). Returns the gated alpha
    plus the per-instance rows the backward recombination needs."""
    blk = blk.astype(jnp.float32)
    mx = blk[_ROW_MX : _ROW_MX + 1, :]
    my = blk[_ROW_MY : _ROW_MY + 1, :]
    ca = blk[_ROW_CA : _ROW_CA + 1, :]
    cb = blk[_ROW_CB : _ROW_CB + 1, :]
    cc = blk[_ROW_CC : _ROW_CC + 1, :]
    op = blk[_ROW_OP : _ROW_OP + 1, :]
    dx = mx - px
    dy = my - py
    power = (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    lane = jax.lax.broadcasted_iota(jnp.int32, (px.shape[0], CHUNK), 1)
    valid = (lane - lo).astype(jnp.uint32) < (hi - lo).astype(jnp.uint32)
    g = jnp.exp(power)
    alpha = jnp.minimum(op * g, ALPHA_MAX)
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & valid
    alpha = jnp.where(keep, alpha, 0.0)
    return dict(alpha=alpha, keep=keep, g=g, op=op, ca=ca, cb=cb, cc=cc,
                mx=mx, my=my)


def _oit_fwd_kernel(grid_x, tile, pair, start_ref, end_ref, inst_ref, out_ref,
                    scr, sems, cur):
    # pair > 1: same tile pairing as the sorted kernels (see _fwd_kernel) —
    # trivially exact here because the sums are commutative and there is no
    # early stop to coarsen
    p = pl.program_id(0)
    num_pairs = pl.num_programs(0)
    first = p * pair
    rows = pair * PPT
    s = start_ref[first]
    e = end_ref[first + pair - 1]
    base = s // CHUNK
    nch = jnp.where(e > s, pl.cdiv(e, CHUNK) - base, 0)
    nctotal = pl.cdiv(end_ref[num_pairs * pair - 1], CHUNK)
    px, py = _pixel_coords(first, grid_x, tile, rows)
    s_col, e_col = _range_cols(start_ref, end_ref, first, pair, rows)

    init, fetch, drain_reads = _read_protocol(inst_ref, scr, sems, cur, nctotal)
    init(p)

    ones_row = jnp.ones((1, CHUNK), jnp.float32)

    # no early stop: every instance contributes to the commutative sums
    def body(ci, st):
        acc, logt = st  # (rows,5), (rows,1)
        g = base + ci
        blk = fetch(g).astype(jnp.float32)
        woff = g * CHUNK
        q = _oit_alpha(blk, px, py, s_col - woff, e_col - woff)
        z = blk[_ROW_FEAT + 3 : _ROW_FEAT + 4, :]  # (1,128) invz
        aw = q["alpha"] * (z * z)
        feat5 = jnp.concatenate(
            [blk[_ROW_FEAT : _ROW_FEAT + 4, :], ones_row], axis=0
        )  # (5,128): r, g, b, invz, 1 (the ones row accumulates D)
        acc = acc + jax.lax.dot_general(
            aw, feat5, (((1,), (1,)), ((), ())),
            precision=BLEND_PRECISION,
            preferred_element_type=jnp.float32,
        )  # (256,5)
        logt = logt + jnp.sum(jnp.log1p(-q["alpha"]), axis=1, keepdims=True)
        return acc, logt

    acc, logt = jax.lax.fori_loop(
        0, nch, body,
        (jnp.zeros((rows, 5), jnp.float32), jnp.zeros((rows, 1), jnp.float32)),
    )
    out_ref[0, :, 0:5] = acc  # N (4) + D (1)
    out_ref[0, :, 5:6] = jnp.exp(logt)  # T
    out_ref[0, :, 6:8] = jnp.zeros((rows, 2), jnp.float32)


def _run_oit_forward(inst_t, tile_start, tile_end, grid_x, grid_y, tile, pair=1):
    num_tiles = grid_x * grid_y
    tile_start, tile_end, num_pad = _pad_ranges(tile_start, tile_end, num_tiles, pair)
    kernel = functools.partial(_oit_fwd_kernel, grid_x, tile, pair)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_pad // pair,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, pair * PPT, 8), lambda t, s, e: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, N_ROWS, CHUNK), inst_t.dtype),
            pltpu.SemaphoreType.DMA((_NBUF,)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_pad // pair, pair * PPT, 8), jnp.float32),
        interpret=_interpret(),
    )(tile_start, tile_end, inst_t)
    return out.reshape(num_pad, PPT, 8)[:num_tiles]


def _oit_bwd_kernel(
    grid_x, tile, pair, start_ref, end_ref, inst_ref, fwd_ref, dout_ref, dinst_ref,
    scr, grad_scr, carry_scr, sems, out_sems, cur,
):
    # pair > 1: block-diagonal per-tile bases exactly as in the sorted
    # backward (_bwd_kernel); the W sum (row 0 of each tile's basis block
    # against alpha*K) becomes the sum of the pair's per-tile rows
    p = pl.program_id(0)
    num_pairs = pl.num_programs(0)
    first = p * pair
    rows = pair * PPT
    s = start_ref[first]
    e = end_ref[first + pair - 1]
    base = s // CHUNK
    nch = jnp.where(e > s, pl.cdiv(e, CHUNK) - base, 0)
    total = end_ref[num_pairs * pair - 1]
    nctotal = pl.cdiv(total, CHUNK)
    px, py = _pixel_coords(first, grid_x, tile, rows)
    s_col, e_col = _range_cols(start_ref, end_ref, first, pair, rows)
    oxs, oys, basis_cols = _pair_bases(first, grid_x, tile, pair, px, py)

    dN = dout_ref[0, :, 0:4]  # (rows,4) cotangents of the raw sums N
    dD = dout_ref[0, :, 4:5]  # (rows,1)
    dT = dout_ref[0, :, 5:6]  # (rows,1)
    t_fin = fwd_ref[0, :, 5:6]
    rT = dT * t_fin  # cotangent of logT = sum log1p(-alpha)
    basis_dN = jnp.concatenate(basis_cols + [dN], axis=1)  # (rows, 6*pair+4)

    init, fetch, drain_reads = _read_protocol(inst_ref, scr, sems, cur, nctotal)
    init(p)

    @pl.when(p == 0)
    def _():
        cur[_PEND] = 0
        cur[_WCNT] = 0

    emit, wr_wait = _make_emit(
        nch, e, total, dinst_ref, grad_scr, carry_scr, out_sems, cur
    )

    def body(ci, _):
        g = base + ci
        blk = fetch(g).astype(jnp.float32)
        woff = g * CHUNK
        q = _oit_alpha(blk, px, py, s_col - woff, e_col - woff)
        feat = blk[_ROW_FEAT : _ROW_FEAT + 4, :]  # (4,128)
        z = feat[3:4, :]
        z2 = z * z  # (1,128)
        alpha = q["alpha"]

        # d(aw)_pi: through N (feature-weighted) and D
        K = (
            dN[:, 0:1] * feat[0:1, :]
            + dN[:, 1:2] * feat[1:2, :]
            + dN[:, 2:3] * feat[2:3, :]
            + dN[:, 3:4] * feat[3:4, :]
            + dD
        )  # (rows,128)
        inv_one_m = 1.0 / (1.0 - alpha)
        dalpha = jnp.where(q["keep"], z2 * K - rT * inv_one_m, 0.0)

        dG = q["op"] * dalpha
        dgm = dG * q["g"]
        aK = alpha * K
        # one merged matmul: each tile's moments of dgm against its own
        # block-diagonal basis, dN^T @ alpha (feature grads + V), and each
        # basis block's row-0 of alpha*K (the W sum for the invz chain
        # through the depth weight)
        out10 = jax.lax.dot_general(
            basis_dN,
            jnp.concatenate([dgm, alpha, aK], axis=1),  # (rows, 384)
            (((0,), (0,)), ((), ())),
            precision=BLEND_PRECISION,
            preferred_element_type=jnp.float32,
        )  # (6*pair+4, 384)
        RA = out10[6 * pair : 6 * pair + 4, CHUNK : 2 * CHUNK]  # dN^T @ alpha
        W = None  # sum_p alpha*K — per-tile ones rows, summed over the pair
        grad6 = None
        for i in range(pair):
            mom = out10[6 * i : 6 * i + 6, 0:CHUNK]
            Wi = out10[6 * i : 6 * i + 1, 2 * CHUNK : 3 * CHUNK]
            W = Wi if W is None else W + Wi
            m0 = mom[0:1, :]
            mxl = q["mx"] - oxs[i]
            myl = q["my"] - oys[i]
            s1x = mxl * m0 - mom[1:2, :]
            s1y = myl * m0 - mom[2:3, :]
            s2xx = mxl * mxl * m0 - 2.0 * mxl * mom[1:2, :] + mom[3:4, :]
            s2xy = mxl * myl * m0 - mxl * mom[2:3, :] - myl * mom[1:2, :] + mom[4:5, :]
            s2yy = myl * myl * m0 - 2.0 * myl * mom[2:3, :] + mom[5:6, :]
            d_op = m0 / jnp.maximum(q["op"], 1e-30)
            block = jnp.concatenate(
                [
                    (q["ca"] + q["ca"]) * s1x + q["cb"] * s1y,  # d mean2d_x
                    (q["cc"] + q["cc"]) * s1y + q["cb"] * s1x,  # d mean2d_y
                    -0.5 * s2xx,
                    -s2xy,
                    -0.5 * s2yy,
                    d_op,
                ],
                axis=0,
            )  # (6,128)
            grad6 = block if grad6 is None else grad6 + block

        # invz chain: N/D see invz through the weight aw = alpha*invz^2
        # (W term) and through the 4th feature (V = RA row 3)
        d_rgb = z2 * RA[0:3, :]
        d_z = (z + z) * W + z2 * RA[3:4, :]

        grad_rows = jnp.concatenate([grad6, d_rgb, d_z], axis=0)  # (10,128)
        pad = jnp.zeros((N_ROWS - 10, CHUNK), jnp.float32)
        emit(ci, g, jnp.concatenate([grad_rows, pad], axis=0))
        return 0

    jax.lax.fori_loop(0, nch, body, 0)

    @pl.when(p == num_pairs - 1)
    def _():
        _drain_writes(cur, wr_wait)


def _run_oit_backward(inst_t, tile_start, tile_end, fwd_out, dout,
                      grid_x, grid_y, tile, pair=1):
    num_tiles = grid_x * grid_y
    k_pad = inst_t.shape[1]
    tile_start, tile_end, num_pad = _pad_ranges(tile_start, tile_end, num_tiles, pair)
    if num_pad != num_tiles:
        ext = ((0, num_pad - num_tiles), (0, 0), (0, 0))
        fwd_out = jnp.pad(fwd_out, ext)
        dout = jnp.pad(dout, ext)
    fwd_out = fwd_out.reshape(num_pad // pair, pair * PPT, 8)
    dout = dout.reshape(num_pad // pair, pair * PPT, 8)
    kernel = functools.partial(_oit_bwd_kernel, grid_x, tile, pair)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_pad // pair,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, pair * PPT, 8), lambda t, s, e: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, pair * PPT, 8), lambda t, s, e: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((_NBUF, N_ROWS, CHUNK), inst_t.dtype),
            pltpu.VMEM((_WBUF, N_ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((N_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((_NBUF,)),
            pltpu.SemaphoreType.DMA((_WBUF,)),
            pltpu.SMEM((4 + _WBUF,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_ROWS, k_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(tile_start, tile_end, inst_t, fwd_out, dout)


@functools.lru_cache(maxsize=None)
def _make_oit_vjp(grid_x: int, grid_y: int, tile: int, pair: int = 1,
                  reduce_pack: bool = False):
    @jax.custom_vjp
    def blend(mean2d, conic, opacity, rgb, invz,
              inst_t, tile_start, tile_end, gauss_id, slot_valid):
        return _run_oit_forward(
            inst_t, tile_start, tile_end, grid_x, grid_y, tile, pair
        )

    def blend_fwd(mean2d, conic, opacity, rgb, invz,
                  inst_t, tile_start, tile_end, gauss_id, slot_valid):
        out = _run_oit_forward(
            inst_t, tile_start, tile_end, grid_x, grid_y, tile, pair
        )
        n_gauss = mean2d.shape[0]
        return out, (out, inst_t, tile_start, tile_end, gauss_id, slot_valid, n_gauss)

    def blend_bwd(res, dout):
        fwd_out, inst_t, tile_start, tile_end, gauss_id, slot_valid, n_gauss = res
        dinst = _run_oit_backward(
            inst_t, tile_start, tile_end, fwd_out, dout, grid_x, grid_y, tile, pair
        )
        dinst = jnp.where(slot_valid[None, :], dinst, 0.0)
        from gsplat_tpu.ops.reduce import reduce_by_gid

        drows = reduce_by_gid(
            dinst, gauss_id, n_gauss,
            pack_bf16=reduce_pack or inst_t.dtype == jnp.bfloat16,
        )
        d_mean2d = drows[_ROW_MX : _ROW_MY + 1].T
        d_conic = drows[_ROW_CA : _ROW_CC + 1].T
        d_op = drows[_ROW_OP]
        d_rgb = drows[_ROW_FEAT : _ROW_FEAT + 3].T
        d_invz = drows[_ROW_FEAT + 3]
        return (
            d_mean2d, d_conic, d_op, d_rgb, d_invz,
            jnp.zeros_like(inst_t), _float0(tile_start), _float0(tile_end),
            _float0(gauss_id), _float0(slot_valid),
        )

    blend.defvjp(blend_fwd, blend_bwd)
    return blend


# ----------------------------------------------------------------------------
# differentiable wrapper
# ----------------------------------------------------------------------------


def _float0(x):
    """Zero cotangent for a non-differentiable (int/bool) custom-vjp arg."""
    return np.zeros(x.shape, jax.dtypes.float0)


@functools.lru_cache(maxsize=None)
def _make_blend_vjp(grid_x: int, grid_y: int, tile: int, track_contrib: bool,
                    reduce_pack: bool = False,
                    pair: int = 1):
    @jax.custom_vjp
    def blend(mean2d, conic, opacity, rgb, invz,
              inst_t, tile_start, tile_end, gauss_id, slot_valid):
        # forward reads the pre-packed (stop-gradient) instance stream; the
        # per-gaussian args exist to wire the custom VJP to them
        return _run_forward(
            inst_t, tile_start, tile_end, grid_x, grid_y, tile, track_contrib, pair
        )

    def blend_fwd(mean2d, conic, opacity, rgb, invz,
                  inst_t, tile_start, tile_end, gauss_id, slot_valid):
        out = _run_forward(
            inst_t, tile_start, tile_end, grid_x, grid_y, tile, track_contrib, pair
        )
        n_gauss = mean2d.shape[0]
        return out, (out, inst_t, tile_start, tile_end, gauss_id, slot_valid, n_gauss)

    def blend_bwd(res, dout):
        fwd_out, inst_t, tile_start, tile_end, gauss_id, slot_valid, n_gauss = res
        dinst = _run_backward(
            inst_t, tile_start, tile_end, fwd_out, dout, grid_x, grid_y, tile, pair
        )  # (16, K)
        # mask padding slots and any segment tail garbage before reduction
        dinst = jnp.where(slot_valid[None, :], dinst, 0.0)
        # CUDA atomicAdd -> gid sort-back + streaming one-hot MXU reduce
        # (ops/reduce.py). The round-1/2 XLA column scatter ran on the
        # scalar scatter engine at ~18ns/instance (21ms/frame at 1.13M
        # instances, ~103ns/inst at garden scale); the sort+reduce pair
        # rides the sort and matrix engines instead and scales ~linearly.
        from gsplat_tpu.ops.reduce import reduce_by_gid

        # in bf16-packet mode the gradient rows also ride the sort
        # bf16-pair-packed (see reduce_by_gid) — half the payload operands
        drows = reduce_by_gid(
            dinst, gauss_id, n_gauss,
            pack_bf16=reduce_pack or inst_t.dtype == jnp.bfloat16,
        )  # (16, N)
        d_mean2d = drows[_ROW_MX : _ROW_MY + 1].T
        d_conic = drows[_ROW_CA : _ROW_CC + 1].T
        d_op = drows[_ROW_OP]
        d_rgb = drows[_ROW_FEAT : _ROW_FEAT + 3].T
        d_invz = drows[_ROW_FEAT + 3]
        return (
            d_mean2d, d_conic, d_op, d_rgb, d_invz,
            jnp.zeros_like(inst_t), _float0(tile_start), _float0(tile_end),
            _float0(gauss_id), _float0(slot_valid),
        )

    blend.defvjp(blend_fwd, blend_bwd)
    return blend


# tiles blended per sorted-kernel grid step (see _fwd_kernel). Default 1 =
# the round-2 shape; 2 stacks adjacent tiles on 512 sublanes. Overridable
# per call via blend_tiles_pallas(tiles_per_step=...) for A/B measurement.
TILES_PER_STEP = 1


def blend_tiles_pallas(
    screen: ScreenGaussians,
    bins,
    grid_x: int,
    grid_y: int,
    tile: int,
    packet_dtype=jnp.float32,
    track_contrib: bool = False,
    blend_mode: str = "sorted",
    tiles_per_step: int | None = None,
    reduce_pack: bool = False,
) -> BlendOutput:
    """Blend the sorted instance stream with the Pallas kernels.

    `bins` is normally a `PackedBins` from `binning.pack_bins` — the fused
    binning already laid the instances out in the kernels' (16, K) lane-major
    packet format, so no per-instance gather happens here (the packet dtype
    was chosen at pack time; `packet_dtype` is ignored). A plain `TileBins`
    is also accepted (handcrafted range patterns in tests): its packets are
    materialized with the simple gather-based packer.

    Either way the blend is differentiable w.r.t. the per-gaussian screen
    arrays through a custom VJP: the backward kernel writes per-instance
    gradient rows and one `segment_sum` over the sorted instance -> gaussian
    map replaces the CUDA atomicAdd (`backward.cu:593-635`).
    """
    assert tile * tile == PPT, "pallas blend kernel is built for 16x16 tiles"
    num_tiles = grid_x * grid_y
    inv_depth_all = 1.0 / jnp.maximum(screen.depth, 0.2)

    if isinstance(bins, PackedBins):
        inst_t = bins.inst_t
        k = inst_t.shape[1]
    else:
        inst_t = pack_from_tilebins(screen, bins, packet_dtype)
        k = inst_t.shape[1]
    gauss_id = bins.gauss_id
    tile_start = bins.tile_start
    tile_end = bins.tile_end
    # instances tight-culled in binning carry tile_id == num_tiles and sort
    # to the tail, outside every tile's [start, end) window
    slot_valid = bins.tile_id < num_tiles
    if slot_valid.shape[0] < k:
        slot_valid = jnp.pad(slot_valid, (0, k - slot_valid.shape[0]))
        gauss_id = jnp.pad(gauss_id, (0, k - gauss_id.shape[0]))

    # Every traced array is an EXPLICIT custom-vjp argument (the structure
    # arrays get float0 cotangents): closing over them instead would leak
    # tracers when the VJP is pulled through an outer transform's transpose
    # (shard_map autodiff re-traces the backward in a different trace).
    pair = TILES_PER_STEP if tiles_per_step is None else tiles_per_step
    if blend_mode == "oit":
        # the custom VJP wraps only the RAW commutative sums (N, D, T); the
        # quotient/compositing below is plain jnp, autodiffed for free
        blend = _make_oit_vjp(grid_x, grid_y, tile, pair, reduce_pack)
        out = blend(
            screen.mean2d, screen.conic, screen.opacity, screen.rgb,
            inv_depth_all, inst_t, tile_start, tile_end, gauss_id, slot_valid,
        )
        numer = out[:, :, 0:4]
        denom = out[:, :, 4]
        t_fin = out[:, :, 5]
        w = (1.0 - t_fin) / jnp.maximum(denom, 1e-8)
        return BlendOutput(
            color=numer[:, :, 0:3] * w[:, :, None],
            invdepth=numer[:, :, 3] * w,
            final_t=t_fin,
            n_contrib=jnp.zeros(t_fin.shape, jnp.int32),
            overflow=jnp.zeros((), jnp.int32),
        )

    blend = _make_blend_vjp(grid_x, grid_y, tile, track_contrib, reduce_pack, pair)
    out = blend(
        screen.mean2d, screen.conic, screen.opacity, screen.rgb, inv_depth_all,
        inst_t, tile_start, tile_end, gauss_id, slot_valid,
    )  # (T, 256, 8)
    return BlendOutput(
        color=out[:, :, 0:3],
        invdepth=out[:, :, 3],
        final_t=out[:, :, 4],
        n_contrib=out[:, :, 5].astype(jnp.int32),
        overflow=jnp.zeros((), jnp.int32),  # no per-tile cap in the pallas path
    )


def pack_from_tilebins(
    screen: ScreenGaussians, bins: TileBins, packet_dtype=jnp.float32
):
    """Gather-based instance packer for a plain TileBins.

    One (N, 16) table + ONE contiguous row-gather at the instance ids (row
    gathers of 64B lines are the fast gather shape on TPU; ten separate
    scalar-column gathers serialize ~10x). Costs ~17ns/instance on the
    gather engine — production rendering uses `binning.pack_bins`, which
    avoids this entirely by carrying the attributes through the sort.
    """
    screen = jax.tree.map(jax.lax.stop_gradient, screen)
    k = bins.gauss_id.shape[0]
    k_pad = _round_up(k, CHUNK)
    invz = 1.0 / jnp.maximum(screen.depth, 0.2)
    # conic folded to [-a/2, -b, -c/2], matching pack_bins' packet layout
    conic_f = screen.conic * jnp.asarray([-0.5, -1.0, -0.5], jnp.float32)
    table = jnp.concatenate(
        [
            screen.mean2d, conic_f, screen.opacity[:, None], screen.rgb,
            invz[:, None],
            jnp.zeros((screen.mean2d.shape[0], N_ROWS - 10), jnp.float32),
        ],
        axis=1,
    )  # (N, 16)
    inst = table[bins.gauss_id]  # (K, 16) single row-gather
    inst = jnp.pad(inst, ((0, k_pad - k), (0, 0)))
    return inst.T.astype(packet_dtype)  # (16, K_pad)
