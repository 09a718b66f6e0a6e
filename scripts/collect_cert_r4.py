#!/usr/bin/env python
"""Collect the round-4 packet-mode certification runs into committed
artifacts: the FAILED all-bf16 run (the measured veto) and the hybrid run
(the shipped default's quality evidence). Per run: results.json,
train-log summary (7k/30k test PSNRs), 2 render|gt pairs."""

from __future__ import annotations

import json
import os
import re
import shutil
import sys

ART = "artifacts/cert_r4"
RUNS = {"lego_bf16": "output/cert_r4/lego_bf16",
        "lego_hybrid": "output/cert_r4/lego_hybrid"}


def main():
    os.makedirs(ART, exist_ok=True)
    summary = {}
    for name, sdir in RUNS.items():
        if not os.path.isdir(sdir):
            print(f"WARNING: {sdir} missing", file=sys.stderr)
            continue
        adir = os.path.join(ART, name)
        os.makedirs(adir, exist_ok=True)
        for f in ("results.json", "per_view.json", "cfg_args"):
            p = os.path.join(sdir, f)
            if os.path.exists(p):
                shutil.copy(p, adir)
        log = os.path.join(sdir, "train_supervised.log")
        if os.path.exists(log):
            keep = [l for l in open(log, errors="replace")
                    if "[ITER" in l and ("test:" in l or "train:" in l)]
            with open(os.path.join(adir, "train_log_summary.txt"), "w") as f:
                f.writelines(keep)
        tdir = os.path.join(sdir, "test")
        if os.path.isdir(tdir):
            best = max(os.listdir(tdir), key=lambda d: int(d.rsplit("_", 1)[-1]))
            rdir = os.path.join(tdir, best, "renders")
            gdir = os.path.join(tdir, best, "gt")
            if os.path.isdir(rdir):
                for n in sorted(os.listdir(rdir))[:2]:
                    shutil.copy(os.path.join(rdir, n),
                                os.path.join(adir, f"render_{best}_{n}"))
                    g = os.path.join(gdir, n)
                    if os.path.exists(g):
                        shutil.copy(g, os.path.join(adir, f"gt_{n}"))
        rj = os.path.join(sdir, "results.json")
        if os.path.exists(rj):
            summary[name] = json.load(open(rj))
    with open(os.path.join(ART, "README.md"), "w") as f:
        f.write(
            "# Round-4 packet-mode certification (lego, 30k, scored on the "
            "f32 parity renderer)\n\n"
            "f32 baseline: 35.47 PSNR (artifacts/lego30k_r2).\n\n"
            "- **lego_bf16 — FAILED**: all-bf16 instance packets reach only "
            "~31.1 PSNR. bf16's 8-bit mantissa quantizes mean2d (pixel "
            "coordinates) to whole pixels at 800px scale; sub-pixel "
            "placement, which training lives on, is gone. This is the "
            "committed measurement that vetoes all-bf16 as a training "
            "default (it remains a forward/serving option).\n"
            "- **lego_hybrid — CERTIFIED (35.11 PSNR / 0.9806 SSIM)**: positions "
            "ride the sorts in f32; conic/opacity/color and the backward "
            "reduce's gradient rows bf16-pair-pack. PSNR sits inside the "
            "f32 cross-round band (35.10-35.47); SSIM is the best "
            "measured. This is the shipped training default "
            "(PipelineConfig.packet_dtype), ~15% faster at the garden "
            "point (234.0 -> 201.9 ms).\n\n"
            "```json\n" + json.dumps(summary, indent=1) + "\n```\n"
        )
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
