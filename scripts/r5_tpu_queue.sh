#!/bin/bash
# Round-5 TPU work queue — run this (solo, no other chip clients) as soon
# as the axon transport is back. Ordered so correctness gates come first,
# then the measurements that decide kernel defaults, then the bench.
set -u
LOG=output/r5_tpu_queue.log
mkdir -p output
{
  echo "=== $(date) validate_hw (full fwd+bwd vs oracle on chip) ==="
  timeout 900 python scripts/validate_hw.py || echo "VALIDATE_HW FAILED rc=$?"
  echo "=== $(date) validate_drain_hw (fast drain + unroll on chip) ==="
  timeout 900 python scripts/validate_drain_hw.py || echo "VALIDATE_DRAIN FAILED rc=$?"
  echo "=== $(date) probe_r5_unroll (roofline + unroll A/B, garden point) ==="
  timeout 1800 python scripts/probe_r5_unroll.py || echo "UNROLL PROBE FAILED rc=$?"
  echo "=== $(date) probe_r5_bf16vpu ==="
  timeout 900 python scripts/probe_r5_bf16vpu.py || echo "BF16 PROBE FAILED rc=$?"
  echo "=== $(date) bench_serving_r5 (render-only, trained clouds) ==="
  timeout 1800 python scripts/bench_serving_r5.py || echo "SERVING BENCH FAILED rc=$?"
  echo "=== $(date) probe_r5_bandcurve ==="
  timeout 1800 python scripts/probe_r5_bandcurve.py || echo "BANDCURVE FAILED rc=$?"
  echo "=== $(date) queue done ==="
} 2>&1 | tee $LOG
