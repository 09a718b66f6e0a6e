#!/bin/bash
# COLMAP-path quality proxy (VERDICT r3 #8): no real COLMAP dataset exists
# on this image, so train the synthetic COLMAP scene (the e2e generator at
# a bigger configuration) to convergence and commit metrics — quality
# evidence for the COLMAP path, not just plumbing evidence.
set -eu
OUT=output/colmap_proxy_r4
SCENE=$OUT/scene
mkdir -p $OUT
python - <<'EOF'
from scripts.make_fixtures import make_colmap_scene
make_colmap_scene("output/colmap_proxy_r4/scene", n_points=2000, n_images=32,
                  width=192, height=128, focal=180.0, seed=3)
EOF
python train.py -s $SCENE -m $OUT/model --eval --iterations 5000 \
  --test_iterations 1000 5000 --save_iterations 5000 \
  --backend pallas --disable_viewer --quiet
python render.py --iteration 5000 -s $SCENE -m $OUT/model --eval --skip_train
python metrics.py -m $OUT/model
echo "COLMAP PROXY DONE"
