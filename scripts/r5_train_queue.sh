#!/bin/bash
# Round-5 training queue, adapted to the fresh container (the round-4
# output/ trees did not survive the restart, so the mic "redo" is a
# retrain). Strictly serialized — one chip, one client. Order = verdict
# priority: mic render-path metrics (#1), chair seed band (#4),
# sparse-Adam A/B (#5), COLMAP proxy at quality grade (#7).
set -u
NS=/root/reference/nerf_synthetic
COMMON="--eval --iterations 30000 --test_iterations 7000 30000 --save_iterations 7000 30000 --backend pallas --disable_viewer --checkpoint_every 500 --quiet"

run_scene () { # src model_dir extra...
  local SRC=$1 MDIR=$2; shift 2
  mkdir -p "$MDIR"
  python scripts/train_supervised.py --stall_timeout 900 -- \
    -s "$SRC" -w -m "$MDIR" $COMMON "$@" || { echo "TRAIN FAILED $MDIR"; return 1; }
  python render.py --iteration 30000 -s "$SRC" -m "$MDIR" --eval --skip_train
  python metrics.py -m "$MDIR"
}

echo "=== $(date) mic 30k (render-path metrics; verdict #1) ==="
run_scene $NS/mic output/full_eval_r5/mic
python render.py --iteration 7000 -s $NS/mic -m output/full_eval_r5/mic --eval --skip_train || true
python metrics.py -m output/full_eval_r5/mic || true

echo "=== $(date) chair seed 1 (verdict #4) ==="
run_scene $NS/chair output/seeds_r5/chair_seed1 --seed 1

echo "=== $(date) chair seed 2 ==="
run_scene $NS/chair output/seeds_r5/chair_seed2 --seed 2

echo "=== $(date) lego sparse-adam (verdict #5) ==="
run_scene $NS/lego output/sparse_ab_r5/lego_sparse --optimizer_type sparse_adam

echo "=== $(date) lego dense (A/B arm 2) ==="
run_scene $NS/lego output/sparse_ab_r5/lego_dense

echo "=== $(date) colmap proxy (verdict #7) ==="
bash scripts/colmap_proxy_r5.sh 2>&1 | tee output/colmap_proxy_r5.log

echo "=== $(date) TRAIN QUEUE DONE ==="
