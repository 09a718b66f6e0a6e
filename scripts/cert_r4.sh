#!/bin/bash
# Round-4 certification lane: lego 30k trained with bf16 instance packets
# (PipelineConfig.packet_dtype) — the quality evidence that lets bf16
# become the training default (sort payload 13.5->10.5 ms + halved blend
# DMA; kernel-level acceptance in tests/test_pallas_blend.py).
# Eval/metrics run on the parity renderer (cfg_args carries no pipeline
# flags), so the comparison is: cloud-trained-under-bf16, scored at f32.
set -u
NS=/root/reference/nerf_synthetic
OUT=output/cert_r4
mkdir -p $OUT
COMMON="--eval --iterations 30000 --test_iterations 7000 30000 --save_iterations 7000 30000 --backend pallas --disable_viewer --checkpoint_every 500"
python scripts/train_supervised.py --stall_timeout 900 -- \
  -s $NS/lego -w -m $OUT/lego_bf16 $COMMON --packet_dtype bfloat16
python render.py --iteration 30000 -s $NS/lego -m $OUT/lego_bf16 --eval --skip_train
python render.py --iteration 7000 -s $NS/lego -m $OUT/lego_bf16 --eval --skip_train
python metrics.py -m $OUT/lego_bf16
echo "CERT DONE"
