#!/bin/bash
# Round-3 quality sweep driver: chair (resume from rolling ckpt) + ship at
# 30k, the other six NeRF-synthetic scenes at 7k.
set -u
NS=/root/reference/nerf_synthetic
OUT=output/full_eval_r3
COMMON="--eval --iterations 30000 --test_iterations 7000 30000 --save_iterations 7000 30000 --backend pallas --disable_viewer --checkpoint_every 500"
# finish chair from its rolling checkpoint (iteration 12000)
python scripts/train_supervised.py -- -s $NS/chair -w -m $OUT/chair $COMMON \
  --start_checkpoint $OUT/chair/rolling_chkpnt.pkl
python full_eval.py -ns $NS --output_path $OUT --scenes chair --iterations 30000 --skip_training
python full_eval.py -ns $NS --output_path $OUT --scenes ship --iterations 30000
python full_eval.py -ns $NS --output_path $OUT --scenes drums ficus hotdog lego materials mic --iterations 7000
echo "SWEEP DONE"
