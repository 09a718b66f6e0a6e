#!/bin/bash
set -u
while ! grep -q "POST-SWEEP DONE" output/post_sweep_r3.log 2>/dev/null; do sleep 60; done
python scripts/validate_hw.py > output/validate_hw_r3.log 2>&1
tail -3 output/validate_hw_r3.log
echo "VALIDATE DONE"
