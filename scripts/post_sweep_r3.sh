#!/bin/bash
# Post-sweep chain: wait for the quality sweep, then OIT lego 7k + benches.
set -u
while ! grep -q "SWEEP DONE" output/sweep_r3.log 2>/dev/null; do sleep 60; done
NS=/root/reference/nerf_synthetic
python scripts/train_supervised.py -- -s $NS/lego -w -m output/oit_lego7k \
  --eval --iterations 7000 --test_iterations 7000 --save_iterations 7000 \
  --backend pallas --blend_mode oit --disable_viewer --checkpoint_every 500
python render.py --iteration 7000 -s $NS/lego -m output/oit_lego7k --eval --skip_train --blend_mode oit
python metrics.py -m output/oit_lego7k
python scripts/bench_oit.py > output/bench_oit_r3.json 2>/dev/null | true
tail -1 output/bench_oit_r3.json
python bench.py > output/bench_r3.json 2>/dev/null | true
tail -1 output/bench_r3.json
echo "POST-SWEEP DONE"
