#!/usr/bin/env python
"""Round-5 probe: gaussian-axis chunk unroll A/B + a real VPU roofline.

The round-4 verdict asked two things of the single-chip story:
 1. compute ACHIEVED vector ops/s against the chip's VPU capability (the
    "VPU floor" claim was asserted from relative ablations only), and
 2. probe the structural levers the ablations never tried — here the
    two-chunk gaussian-axis unroll (256 instance lanes per loop trip).

Method: garden point (1M gaussians, 1920x1080, hybrid packets, run-trimmed
emission), blend kernels timed in isolation after a full-pipeline warmup
anchor (axon fake-fast trap), FWD_UNROLL/BWD_UNROLL swept over {1, 2, 4}.
The unroll is bitwise-exact vs unroll=1 (tests/test_pallas_blend.py::
test_unroll_bitwise_matches_baseline), so wall-clock is the only question.

Roofline bookkeeping: per (256,128) chunk-tile the forward issues ~60
vector array-ops (hand count below) = 60*32 = 1920 vreg-ops; the backward
~85 plus two HIGHEST MXU contractions. v5e TensorCore at ~1.5 GHz gives
  - 1-op/cycle issue bound: 1.5e9 vreg-ops/s  (the round-3 planning model)
  - 4-ALU VPU peak:         6.0e9 vreg-ops/s
Utilization = (chunks/s * vreg-ops/chunk) / bound. If the measured number
sits well under the issue bound, the gap is loop/protocol overhead (what
the unroll attacks), not a compute floor.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

# hand-counted vector array-ops on (256,128) tiles per chunk (see
# _chunk_blend + kernel bodies; cumprod/cumsum/min-reduce = 7 shifted
# multiply/select steps each):
FWD_OPS_PER_CHUNK = 60
BWD_OPS_PER_CHUNK = 85
VREGS_PER_OP = 32  # a (256,128) f32 array = 32 (8,128) vregs
CLOCK = 1.5e9  # v5e TensorCore ~1.5 GHz (197 bf16 TFLOPs / 4 MXUs / 32768)
ISSUE_BOUND = CLOCK * 1.0  # 1 vreg-op/cycle
ALU_PEAK = CLOCK * 4.0  # 4 VPU ALUs


def timeit(fn, *args, iters=6, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main(n=1_048_576, width=1920, height=1080):
    from __graft_entry__ import _tiny_scene
    from gsplat_tpu.capacity import probe_instance_capacity, round128
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.ops import rasterize_pallas as rp
    from gsplat_tpu.ops.binning import pack_bins
    from gsplat_tpu.ops.projection import preprocess
    from gsplat_tpu.render import grid_dims, render

    params, alive, camera = _tiny_scene(
        n=n, width=width, height=height, sh_degree=3, capacity=n
    )
    holder = type("H", (), {"camera": camera})
    peak = probe_instance_capacity(params, alive, [holder])
    settings = make_render_settings(
        sh_degree=3, max_per_tile=2048, instance_capacity=round128(peak),
        backend="pallas", packet_dtype="hybrid",
    )
    gx, gy = grid_dims(camera, settings.tile)

    # warmup anchor: a full fwd+bwd step (un-warmed axon sessions report
    # fake-fast kernel times — anchor this number against known frame cost)
    def loss_fn(p, a):
        out = render(camera, p, a, settings, jnp.zeros(3))
        return out["render"].mean() + 0.0 * out["invdepth"].mean()

    step = jax.jit(jax.grad(loss_fn))
    t_anchor, _ = timeit(step, params, alive, iters=3, warmup=1)
    print(f"anchor full fwd+bwd: {t_anchor*1e3:.1f} ms "
          f"({width*height/t_anchor/1e6:.2f} Mpix/s)", flush=True)

    screen = jax.jit(lambda p, a: preprocess(p, a, camera, settings, gx, gy))(
        params, alive
    )
    bins = jax.jit(
        lambda s: pack_bins(s, gx, gy, settings.instance_capacity,
                            packet_dtype="hybrid")
    )(screen)
    jax.block_until_ready(bins.inst_t)

    # chunk census for the roofline: each tile walks ceil(range/128) window
    # chunks (early stop reduces this on saturated pixels; census is the
    # upper bound actually issued by the live path + drain fetches)
    ts = np.asarray(bins.tile_start)
    te = np.asarray(bins.tile_end)
    base = ts // 128
    nch = np.where(te > ts, (te + 127) // 128 - base, 0)
    total_chunks = int(nch.sum())
    n_inst = int(bins.num_instances)
    print(f"instances={n_inst} capacity={settings.instance_capacity} "
          f"tile-chunks={total_chunks}", flush=True)

    results = {"anchor_ms": round(t_anchor * 1e3, 1), "chunks": total_chunks}
    for unroll in (1, 2, 4):
        rp.FWD_UNROLL = unroll
        rp.BWD_UNROLL = unroll
        rp._make_blend_vjp.cache_clear()

        fwd = jax.jit(
            lambda i, s, e: rp._run_forward(i, s, e, gx, gy, 16, False, 1,
                                            unroll=unroll)
        )
        t_f, fout = timeit(fwd, bins.inst_t, bins.tile_start, bins.tile_end)

        dout = jnp.ones_like(fout)
        bwd = jax.jit(
            lambda i, s, e, f, d: rp._run_backward(i, s, e, f, d, gx, gy, 16,
                                                   1, unroll=unroll)
        )
        t_b, _ = timeit(bwd, bins.inst_t, bins.tile_start, bins.tile_end,
                        fout, dout)

        # utilization vs the census chunk count (conservative: early stop
        # means fewer real chunks, i.e. true utilization >= printed)
        f_ops = total_chunks * FWD_OPS_PER_CHUNK * VREGS_PER_OP / t_f
        b_ops = total_chunks * BWD_OPS_PER_CHUNK * VREGS_PER_OP / t_b
        row = {
            "fwd_ms": round(t_f * 1e3, 2),
            "bwd_ms": round(t_b * 1e3, 2),
            "fwd_vregops_per_s": f"{f_ops:.3e}",
            "bwd_vregops_per_s": f"{b_ops:.3e}",
            "fwd_util_issue": round(f_ops / ISSUE_BOUND, 3),
            "fwd_util_4alu": round(f_ops / ALU_PEAK, 3),
            "bwd_util_issue": round(b_ops / ISSUE_BOUND, 3),
            "bwd_util_4alu": round(b_ops / ALU_PEAK, 3),
            "fwd_us_per_chunk": round(t_f / total_chunks * 1e6, 3),
            "bwd_us_per_chunk": round(t_b / total_chunks * 1e6, 3),
        }
        results[f"unroll{unroll}"] = row
        print(f"unroll={unroll}: fwd {t_f*1e3:7.2f} ms "
              f"({row['fwd_us_per_chunk']:.2f} us/chunk, "
              f"{row['fwd_util_issue']:.0%} of issue bound, "
              f"{row['fwd_util_4alu']:.0%} of 4-ALU peak) | "
              f"bwd {t_b*1e3:7.2f} ms "
              f"({row['bwd_us_per_chunk']:.2f} us/chunk, "
              f"{row['bwd_util_issue']:.0%} issue, "
              f"{row['bwd_util_4alu']:.0%} 4-ALU)", flush=True)

    # end-to-end with the best unroll re-checked against the anchor
    rp.FWD_UNROLL = 2
    rp.BWD_UNROLL = 2
    rp._make_blend_vjp.cache_clear()
    step2 = jax.jit(jax.grad(loss_fn))
    t2, _ = timeit(step2, params, alive, iters=3, warmup=1)
    results["full_step_unroll2_ms"] = round(t2 * 1e3, 1)
    print(f"full fwd+bwd @ unroll=2: {t2*1e3:.1f} ms "
          f"({width*height/t2/1e6:.2f} Mpix/s) vs anchor {t_anchor*1e3:.1f}",
          flush=True)
    rp.FWD_UNROLL = 1
    rp.BWD_UNROLL = 1
    rp._make_blend_vjp.cache_clear()
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
