#!/bin/bash
# COLMAP-path quality run (VERDICT r4 #7): the round-4 proxy (192x128, 32
# views, 5k iters, 17.73 dB) proved plumbing; this proves the COLMAP path
# TRAINS — full 30k schedule, densification active, 64 views at 400x304,
# done-bar >25 dB on the held-out (llffhold=8) split.
#
# Fixture note (measured 2026-08-21): the disc-splat GT capped at ~17 dB
# at 30k because fixed-size z-buffered screen discs are not 3D-consistent
# imagery — the bar measured the fixture, not the trainer. The quality
# run uses make_colmap_gaussian_scene: GT rendered from a known gaussian
# cloud through OUR OWN COLMAP reader round-trip, so the scene is inside
# the model class and >25 dB is reachable by a correct pipeline.
set -eu
OUT=output/colmap_proxy_r5
SCENE=$OUT/scene
mkdir -p $OUT
python - <<'EOF'
from scripts.make_fixtures import make_colmap_gaussian_scene
make_colmap_gaussian_scene("output/colmap_proxy_r5/scene", n_gauss=4096,
                           n_points=2048, n_images=64,
                           width=400, height=304, focal=380.0, seed=3)
EOF
python scripts/train_supervised.py --stall_timeout 900 -- \
  -s $SCENE -m $OUT/model --eval --iterations 30000 \
  --test_iterations 7000 30000 --save_iterations 30000 \
  --backend pallas --disable_viewer --quiet --checkpoint_every 500
python render.py --iteration 30000 -s $SCENE -m $OUT/model --eval --skip_train
python metrics.py -m $OUT/model
echo "COLMAP PROXY R5 DONE"
