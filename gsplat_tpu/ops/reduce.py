"""Per-gaussian gradient reduction: gid sort-back + streaming one-hot reduce.

TPU-native replacement for the CUDA backward's atomicAdd gradient
accumulation (`diff-gaussian-rasterization-npu/cuda_rasterizer/backward.cu:
593-635`). Rounds 1-2 used one XLA column scatter-add
(`.at[:, gauss_id].add`), which runs on the scalar scatter engine at
~18 ns/instance — 21 ms at 1.13M instances and a catastrophic ~103 ns/inst
(465 ms) at garden scale (4.5M instances -> 1M gaussians; measured,
`scripts/probe_r3.py`). Here the same reduction runs on engines that scale:

1. ONE wide unstable sort keyed by gaussian id moves the (16, K) gradient
   rows into gid-contiguous order (the sort engine is ~0.7 ms/operand/M rows
   and O(K log K) — ~12 ms at 1.13M, ~50 ms at 4.5M);
2. a Pallas kernel streams the sorted rows and accumulates each 512-slot
   chunk into a rolling 128-aligned gaussian window with an exact one-hot
   MXU matmul (onehot[i, w] = gid_i == window_gid_w; integer-valued f32
   compares are exact below 2^24 — the binning expand kernel's machinery,
   `binning._expand_kernel`, running in transpose), flushing completed
   window blocks to the (16, N) output as the window advances.

Because the sorted gids are monotone, the window only moves forward: total
work is ~one matmul per chunk plus one DMA per 128 gaussians, independent
of how the instances scatter across gaussians.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ROWS = 16  # gradient block sublane count (matches rasterize_pallas)
_RCHUNK = 512  # sorted instance slots per grid step
_RWIN = 768  # gaussian-window lanes per one-hot matmul (128-multiple)
_RBLOCKS = 8  # rolling accumulator size in 128-lane blocks (> _RWIN/128)
_ROW_GID = 10  # f32 gaussian id row inside the sorted gradient block

# SMEM cursor indices (persist across grid invocations)
_CUR_FLUSHED = 0  # first gaussian column not yet flushed to HBM
_CUR_WCNT = 1  # number of flush DMAs issued so far


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _reduce_kernel(n_pad, w0_ref, blk_ref, out_ref, ring, stage, sems, cur):
    """Accumulate one 512-slot chunk of gid-sorted gradient rows.

    `ring` is an (_RBLOCKS, 16, 128) rolling accumulator over the gaussian
    columns [flushed, flushed + _RBLOCKS*128); block b of the gid axis lives
    in ring slot b % _RBLOCKS (leading-axis dynamic indexing — the only
    dynamic VMEM indexing Mosaic supports cheaply). Ring blocks are flushed
    (copied to a staging buffer, DMA'd to `out_ref`, zeroed) strictly
    left-to-right as the window advances, so a slot is always zero when the
    gid axis wraps back onto it; blocks the stream skips entirely flush
    their still-zero slot, which also zero-fills the output for gaussians
    with no instances. Flushing never passes the current chunk's first gid:
    later chunks only touch gids >= this chunk's maximum (sorted input), so
    every flushed column is final.
    """
    c = pl.program_id(0)
    nc = pl.num_programs(0)

    @pl.when(c == 0)
    def _():
        cur[_CUR_FLUSHED] = 0
        cur[_CUR_WCNT] = 0
        for b in range(_RBLOCKS):
            ring[b] = jnp.zeros((N_ROWS, 128), jnp.float32)

    def flush_to(limit):
        """Flush ring blocks [cur[_CUR_FLUSHED], limit); both 128-aligned."""

        def body(f):
            w = cur[_CUR_WCNT]
            slot = w % 2
            rb = (f // 128) % _RBLOCKS

            @pl.when(w >= 2)
            def _():
                # equal-size wait on this slot's previous flush
                pltpu.make_async_copy(
                    stage.at[slot],
                    out_ref.at[:, pl.ds(0, 128)],
                    sems.at[slot],
                ).wait()

            stage[slot] = ring[rb]
            ring[rb] = jnp.zeros((N_ROWS, 128), jnp.float32)
            pltpu.make_async_copy(
                stage.at[slot],
                out_ref.at[:, pl.ds(pl.multiple_of(f, 128), 128)],
                sems.at[slot],
            ).start()
            cur[_CUR_WCNT] = w + 1
            cur[_CUR_FLUSHED] = f + 128
            return f + 128

        jax.lax.while_loop(lambda f: f < limit, body, cur[_CUR_FLUSHED])

    blk = blk_ref[...]  # (16, 512) f32: rows 0..9 grads, row 10 gid
    gid_row = blk[_ROW_GID : _ROW_GID + 1, :]  # (1, 512)
    # clamp: a contract-violating gid >= n_pad would otherwise keep
    # win_cond true while skip-ahead pins the window at n_pad — an
    # infinite loop (device hang). Clamped, out-of-range ids degrade to
    # dropped work instead.
    chunk_max = jnp.minimum(
        jnp.max(gid_row).astype(jnp.int32), jnp.int32(n_pad - 1)
    )
    w0 = jnp.maximum(w0_ref[c], cur[_CUR_FLUSHED])

    def win_cond(st):
        w = st
        return w <= chunk_max

    def win_body(w):
        # blocks left of this window are final: no remaining slot in this
        # chunk (gid >= w) nor any later chunk (gid >= chunk_max >= w)
        # touches them
        flush_to(w)
        gcol = (
            w + jax.lax.broadcasted_iota(jnp.int32, (_RCHUNK, _RWIN), 1)
        ).astype(jnp.float32)
        onehot = (gid_row.T == gcol).astype(jnp.float32)  # (512, 768) exact
        dwin = jax.lax.dot_general(
            blk, onehot, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (16, 768)
        for j in range(_RWIN // 128):
            rb = (w // 128 + j) % _RBLOCKS
            ring[rb] = ring[rb] + dwin[:, j * 128 : (j + 1) * 128]
        # skip-ahead: jump to the first unconsumed gid instead of walking
        # empty windows when this chunk's gids are sparse
        nxt = jnp.min(
            jnp.where(gid_row >= jnp.float32(w) + _RWIN, gid_row, jnp.float32(n_pad))
        )
        return jnp.minimum(nxt.astype(jnp.int32), n_pad) // 128 * 128

    jax.lax.while_loop(win_cond, win_body, w0)

    @pl.when(c == nc - 1)
    def _():
        flush_to(n_pad)
        w = cur[_CUR_WCNT]

        @pl.when(w >= 2)
        def _():
            pltpu.make_async_copy(
                stage.at[w % 2], out_ref.at[:, pl.ds(0, 128)], sems.at[w % 2]
            ).wait()

        @pl.when(w >= 1)
        def _():
            pltpu.make_async_copy(
                stage.at[(w + 1) % 2],
                out_ref.at[:, pl.ds(0, 128)],
                sems.at[(w + 1) % 2],
            ).wait()


def _run_reduce(comb, w0, n_pad, interpret):
    num_chunks = comb.shape[1] // _RCHUNK
    kernel = functools.partial(_reduce_kernel, n_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec(
                (N_ROWS, _RCHUNK), lambda c, w: (0, c), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((_RBLOCKS, N_ROWS, 128), jnp.float32),  # rolling acc
            pltpu.VMEM((2, N_ROWS, 128), jnp.float32),  # flush staging
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_ROWS, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(w0, comb)


def reduce_by_gid(dinst, gauss_id, n_gauss: int, pack_bf16: bool = False):
    """Sum (16, K) per-instance gradient rows into (16, n_gauss) columns.

    Only rows 0..9 of `dinst` are meaningful (rows 10..15 of the RESULT are
    scratch garbage); callers must mask invalid slots' gradients to zero
    beforehand. Replaces `jnp.zeros((16, N)).at[:, gauss_id].add(dinst)`
    with engines that scale past the scalar scatter unit (module docstring).

    `pack_bf16` rides the ten gradient rows through the sort as five
    bf16-pair-packed int32 operands (halving the dominant per-operand sort
    cost); per-instance contributions round to bf16 BEFORE the f32
    accumulation. Callers gate this on the bf16-packet mode
    (`RenderSettings.packet_dtype`), whose forward already carries
    bf16-level error — quality-certified end to end, not parity-exact.
    """
    k = dinst.shape[1]
    assert dinst.shape[0] == N_ROWS
    if n_gauss > (1 << 24):
        raise ValueError("gid sort-back requires gaussian count < 2^24")

    # ONE unstable sort: gid key (equal keys may permute, changing only the
    # f32 summation order within a gaussian) + the ten live gradient rows.
    if pack_bf16:
        from gsplat_tpu.ops.binning import pack2_bf16, unpack2_bf16

        packed = tuple(
            pack2_bf16(dinst[r], dinst[r + 1]) for r in range(0, 10, 2)
        )
        ops_p = jax.lax.sort(
            (gauss_id,) + packed, num_keys=1, is_stable=False
        )
        grad_rows = [
            x.astype(jnp.float32)
            for c in ops_p[1:]
            for x in unpack2_bf16(c)
        ]
        ops = (ops_p[0],) + tuple(grad_rows)
    else:
        ops = jax.lax.sort(
            (gauss_id,) + tuple(dinst[r] for r in range(10)),
            num_keys=1,
            is_stable=False,
        )
    gid_s = ops[0]

    k_pad = _round_up(max(k, _RCHUNK), _RCHUNK)
    pad = k_pad - k
    n_pad = _round_up(max(n_gauss, 128), 128)

    if pad:
        # padding slots repeat the LAST real gid with zero gradients: the
        # gid row stays monotone and the zeros land in a real column,
        # instead of forcing a window walk to an artificial sentinel
        gid_f = jnp.concatenate(
            [gid_s.astype(jnp.float32), jnp.broadcast_to(gid_s[-1:].astype(jnp.float32), (pad,))]
        )
        rows = [jnp.pad(r, (0, pad)) for r in ops[1:]]
    else:
        gid_f = gid_s.astype(jnp.float32)
        rows = list(ops[1:])
    rows = rows + [gid_f]
    comb = jnp.stack(
        rows + [jnp.zeros((k_pad,), jnp.float32)] * (N_ROWS - len(rows)), axis=0
    )

    # per-chunk window start: the chunk's first gid, 128-aligned
    first = comb[_ROW_GID, :: _RCHUNK].astype(jnp.int32)
    w0 = first // 128 * 128

    interpret = jax.default_backend() == "cpu"
    out = _run_reduce(comb, w0, n_pad, interpret)
    return out[:, :n_gauss]
