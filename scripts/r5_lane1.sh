#!/bin/bash
# Round-5 training lane 1: mic metrics redo (verdict #1) then the chair
# seed-variance study (verdict #4: bound the -0.30 dB chair deficit).
# Seeds 1 and 2 join the round-3 chair run (seed 0, 35.52) for a
# 3-sample band.
set -u
NS=/root/reference/nerf_synthetic
OUT=output/seeds_r5
mkdir -p $OUT

bash scripts/redo_mic_metrics.sh 2>&1 | tee output/redo_mic_r5.log

COMMON="--eval --iterations 30000 --test_iterations 7000 30000 --save_iterations 30000 --backend pallas --disable_viewer --checkpoint_every 500 --quiet"
for SEED in 1 2; do
  python scripts/train_supervised.py --stall_timeout 900 -- \
    -s $NS/chair -w -m $OUT/chair_seed$SEED $COMMON --seed $SEED
  python render.py --iteration 30000 -s $NS/chair -m $OUT/chair_seed$SEED --eval --skip_train
  python metrics.py -m $OUT/chair_seed$SEED
done
echo "LANE1 DONE"
