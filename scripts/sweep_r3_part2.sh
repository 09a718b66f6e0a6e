#!/bin/bash
# Round-3 sweep part 2: the six remaining NeRF-synthetic scenes at 7k, then
# the OIT lego run, benches, and hardware validation. (chair/ship 30k done.)
set -u
cd /root/repo
NS=/root/reference/nerf_synthetic
OUT=output/full_eval_r3
python full_eval.py -ns $NS --output_path $OUT --scenes drums ficus hotdog lego materials mic --iterations 7000
echo "SWEEP DONE"
python scripts/train_supervised.py --stall_timeout 900 -- -s $NS/lego -w -m output/oit_lego7k \
  --eval --iterations 7000 --test_iterations 7000 --save_iterations 7000 \
  --backend pallas --blend_mode oit --disable_viewer --checkpoint_every 500
python render.py --iteration 7000 -s $NS/lego -m output/oit_lego7k --eval --skip_train --blend_mode oit
python metrics.py -m output/oit_lego7k
python scripts/bench_oit.py > output/bench_oit_r3.json 2>&1
tail -1 output/bench_oit_r3.json
python bench.py > output/bench_r3.json 2>&1
tail -1 output/bench_r3.json
python scripts/validate_hw.py > output/validate_hw_r3.log 2>&1
tail -3 output/validate_hw_r3.log
echo "ALL DONE"
