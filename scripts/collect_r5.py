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


def tb_iter_time(model_dir):
    """Wall-time stats from the tensorboard `iter_time` scalar.

    iter_time is logged every `log_every` (default 10) iterations, and
    the logging iteration float()s device metrics — draining JAX's async
    dispatch queue — so each sample absorbs ~log_every iterations of
    device time. The SUM therefore approximates device-side training
    wall time (compiles/evals/saves excluded), and the "steady" median
    is per log TICK (~10 iterations), not per iteration. Both are used
    comparatively (A/B under identical cadence), not as absolutes."""
    import glob

    evs = sorted(glob.glob(os.path.join(model_dir, "events.out.tfevents.*")))
    if not evs:
        return None
    try:
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )
    except Exception:
        return None
    total_ms, late = 0.0, []
    for ev in evs:
        acc = EventAccumulator(ev, size_guidance={"scalars": 0})
        acc.Reload()
        if "iter_time" not in acc.Tags().get("scalars", []):
            continue
        for s in acc.Scalars("iter_time"):
            total_ms += s.value
            if s.step > 15000:
                late.append(s.value)
    if total_ms == 0.0:
        return None
    late.sort()
    return {
        "train_minutes_tb": round(total_ms / 60000.0, 1),
        "steady_iter_ms_median": (
            round(late[len(late) // 2], 1) if late else None
        ),
    }


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
        tb = tb_iter_time(d)
        if tb:
            row.update(tb)
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
        # quality-grade run: GT is a gaussian render round-tripped through
        # our COLMAP reader (inside the model class; >25 dB done-bar)
        ("model", "output/colmap_proxy_r5/model"),
        # fixture-ceiling evidence: the disc-splat GT caps near 17 dB
        # because fixed-size screen discs are not 3D-consistent imagery
        ("model_discsplat", "output/colmap_proxy_r5/model_discsplat"),
    ])
    collect("full_eval_r5", [
        ("mic", "output/full_eval_r5/mic"),
        ("ship", "output/full_eval_r5/ship"),
    ])


if __name__ == "__main__":
    main()
