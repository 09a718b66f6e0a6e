#!/bin/bash
# Round-5 training lane 2: sparse-Adam A/B (verdict #5) then the
# quality-grade synthetic-COLMAP run (verdict #7).
#
# Sparse A/B: lego 30k, dense vs sparse optimizer mode, SAME session
# ordering (sparse first, dense second) so chip contention from lane 1
# hits both arms; wall time read from each run's own iter-time log.
set -u
NS=/root/reference/nerf_synthetic
OUT=output/sparse_ab_r5
mkdir -p $OUT

COMMON="--eval --iterations 30000 --test_iterations 7000 30000 --save_iterations 30000 --backend pallas --disable_viewer --checkpoint_every 500 --quiet"
python scripts/train_supervised.py --stall_timeout 900 -- \
  -s $NS/lego -w -m $OUT/lego_sparse $COMMON --optimizer_type sparse_adam
python render.py --iteration 30000 -s $NS/lego -m $OUT/lego_sparse --eval --skip_train
python metrics.py -m $OUT/lego_sparse

python scripts/train_supervised.py --stall_timeout 900 -- \
  -s $NS/lego -w -m $OUT/lego_dense $COMMON
python render.py --iteration 30000 -s $NS/lego -m $OUT/lego_dense --eval --skip_train
python metrics.py -m $OUT/lego_dense

bash scripts/colmap_proxy_r5.sh 2>&1 | tee output/colmap_proxy_r5.log
echo "LANE2 DONE"
