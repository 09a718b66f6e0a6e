#!/bin/bash
# Round-4 certification, take 2: the all-bf16 packet run FAILED quality
# (lego 30k 30.42 vs f32 35.47 — bf16's 8-bit mantissa is whole pixels at
# 800px scale). This certifies the HYBRID mode instead: positions stay f32
# through the sort, the value columns (conic/opacity/color) and the
# backward reduce's gradient rows ride bf16-pair-packed. Scored on the f32
# parity renderer like the first run.
set -u
NS=/root/reference/nerf_synthetic
OUT=output/cert_r4
mkdir -p $OUT
COMMON="--eval --iterations 30000 --test_iterations 7000 30000 --save_iterations 7000 30000 --backend pallas --disable_viewer --checkpoint_every 500"
python scripts/train_supervised.py --stall_timeout 900 -- \
  -s $NS/lego -w -m $OUT/lego_hybrid $COMMON --packet_dtype hybrid
python render.py --iteration 30000 -s $NS/lego -m $OUT/lego_hybrid --eval --skip_train
python render.py --iteration 7000 -s $NS/lego -m $OUT/lego_hybrid --eval --skip_train
python metrics.py -m $OUT/lego_hybrid
echo "HYBRID CERT DONE"
