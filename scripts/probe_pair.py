#!/usr/bin/env python
"""A/B measure tile pairing (rasterize_pallas.TILES_PER_STEP) on hardware.

Round-3 question: the backward-blend ablation showed ~6-10ms of per-tile
loop/DMA skeleton and isolated-op microbenches 5-25x cheaper than their
in-kernel share — if the kernels are issue/latency-bound rather than
VPU-throughput-bound, blending two adjacent tiles per grid step (512
sublanes, half the chunk-loop trips) should recover real time. If they are
throughput-bound, pairing is a wash. Measure, don't estimate.

Run on the real chip. Prints one JSON line per (scale, pair) with fwd+bwd
wall time; anchors on the known full-step cost first (fake-fast axon
session trap — see the verify skill notes).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import gsplat_tpu.ops.rasterize_pallas as rp
from bench import measure


def run(n, pairs=(1, 2)):
    out = {}
    for pair in pairs:
        rp.TILES_PER_STEP = pair
        # measure() builds a FRESH jit each call, so the module global is
        # re-read at trace time (the vjp factory is lru-cached per pair)
        rate, peak = measure(n=n)
        ms = 1920 * 1080 / rate * 1e3
        out[pair] = ms
        print(
            json.dumps(
                {
                    "n_gauss": n,
                    "tiles_per_step": pair,
                    "fwd_bwd_ms": round(ms, 2),
                    "pixels_per_s": round(rate, 1),
                    "instances": peak,
                }
            ),
            flush=True,
        )
    if 1 in out and 2 in out:
        print(
            json.dumps(
                {"n_gauss": n, "pair_speedup": round(out[1] / out[2], 3)}, flush=True
            )
        )
    rp.TILES_PER_STEP = 1


if __name__ == "__main__":
    assert jax.devices()[0].platform != "cpu", "hardware probe"
    # anchor: the 262k full step is known ~110-120ms; distrust a session
    # reporting far less
    run(262_144, pairs=(1, 2, 4))
    run(1_048_576, pairs=(1, 2, 4))
