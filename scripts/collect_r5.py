#!/usr/bin/env python
"""Collect round-5 study artifacts into artifacts/:

- seed study  (output/seeds_r5/chair_seed{1,2} + the round-3 chair run)
- sparse-Adam A/B (output/sparse_ab_r5/lego_{sparse,dense})
- COLMAP proxy (output/colmap_proxy_r5/model)

Each scene dir contributes its metrics.py results.json plus the wall-time
and final alive-count parsed from train_supervised.log.
"""

import json
import os
import re
import shutil
import sys

ART = "artifacts"


def wall_minutes(log_path):
    """Sum per-restart training wall time from the supervisor log's final
    iteration prints (`it  30000 ... (1234.5s)` resets per relaunch)."""
    if not os.path.exists(log_path):
        return None
    total, last = 0.0, 0.0
    for line in open(log_path, errors="replace"):
        m = re.search(r"\((\d+(?:\.\d+)?)s\)\s*$", line.strip())
        if m:
            v = float(m.group(1))
            if v < last:  # relaunch reset
                total += last
            last = v
    return round((total + last) / 60.0, 1)


def read_results(model_dir):
    p = os.path.join(model_dir, "results.json")
    if not os.path.exists(p):
        return None
    return json.load(open(p))


def collect(tag, model_dirs):
    out = {}
    for name, d in model_dirs:
        row = {"results": read_results(d)}
        lg = os.path.join(d, "train_supervised.log")
        row["train_minutes"] = wall_minutes(lg)
        out[name] = row
    dst = os.path.join(ART, tag)
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(dst, "summary.json"), "w") as f:
        json.dump(out, f, indent=1)
    for name, d in model_dirs:
        for fn in ("results.json", "per_view.json", "cfg_args"):
            src = os.path.join(d, fn)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(dst, f"{name}_{fn}"))
    print(f"{tag}: {json.dumps(out)}")


def main():
    collect("seeds_r5", [
        ("chair_seed0_r3", "output/full_eval_r3/chair"),
        ("chair_seed1", "output/seeds_r5/chair_seed1"),
        ("chair_seed2", "output/seeds_r5/chair_seed2"),
    ])
    collect("sparse_ab_r5", [
        ("lego_sparse", "output/sparse_ab_r5/lego_sparse"),
        ("lego_dense", "output/sparse_ab_r5/lego_dense"),
    ])
    collect("colmap_proxy_r5", [
        ("model", "output/colmap_proxy_r5/model"),
    ])


if __name__ == "__main__":
    main()
