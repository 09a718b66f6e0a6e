#!/bin/bash
# Re-run the mic renders + metrics that hit the end-of-round-4 axon
# transport outage, then refresh the committed artifacts.
set -u
NS=/root/reference/nerf_synthetic
python render.py --iteration 30000 -s $NS/mic -m output/full_eval_r4/mic --eval --skip_train
python render.py --iteration 7000 -s $NS/mic -m output/full_eval_r4/mic --eval --skip_train
python metrics.py -m output/full_eval_r4/mic
python -m scripts.collect_full_eval_r4
