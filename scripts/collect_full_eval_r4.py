#!/usr/bin/env python
"""Collect the round-4 8-scene NeRF-synthetic evidence into committed
artifacts (VERDICT r3 item 2).

Sources (provenance recorded per scene in SUMMARY.md):
  - output/full_eval_r4  — drums/ficus/hotdog/materials/mic, trained to
    30k this round under the fixed watchdog
  - output/full_eval_r3  — chair & ship 30k (round-3 runs; the trained
    clouds this round's bench_trained measurements use)
  - artifacts/lego30k_r2 — lego 30k (round-2 run, PSNR 35.47), copied
    through unchanged

Per scene: results.json, per_view.json, 2 render|gt pairs from the
highest-iteration test set, train-curve JSON from tensorboard events, and
a summary table against the 3DGS-paper 30k PSNRs the reference's chart
images track (/root/reference/results.md publishes images, not numbers).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

ART = "artifacts/full_eval_r4"

# provenance: training round + packet mode (materials/mic trained after
# the hybrid default flip — broader validation of the shipped default;
# every scene is SCORED on the f32 parity renderer either way)
SOURCES = {
    "drums": ("output/full_eval_r4/drums", "round 4, f32"),
    "ficus": ("output/full_eval_r4/ficus", "round 4, f32"),
    "hotdog": ("output/full_eval_r4/hotdog", "round 4, f32"),
    "materials": ("output/full_eval_r4/materials", "round 4, hybrid"),
    "mic": ("output/full_eval_r4/mic", "round 4, hybrid"),
    "chair": ("output/full_eval_r3/chair", "round 3, f32"),
    "ship": ("output/full_eval_r3/ship", "round 3, f32"),
}

REF_30K = {
    "chair": 35.82, "drums": 26.17, "ficus": 34.83, "hotdog": 37.67,
    "lego": 35.69, "materials": 30.00, "mic": 35.34, "ship": 30.87,
}

N_PAIRS = 2


def curves(scene_dir):
    try:
        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )
    except Exception:
        return None
    pts = []
    for f in sorted(os.listdir(scene_dir)):
        if not f.startswith("events.out"):
            continue
        acc = EventAccumulator(os.path.join(scene_dir, f))
        acc.Reload()
        for tag in acc.Tags().get("scalars", []):
            if tag.endswith("loss_ema") or tag == "train_loss_patches/total_loss":
                pts += [(e.step, e.value) for e in acc.Scalars(tag)]
    pts.sort()
    return pts or None


def collect_scene(scene, sdir, adir):
    rj = os.path.join(sdir, "results.json")
    if not os.path.exists(rj):
        return None
    os.makedirs(adir, exist_ok=True)
    shutil.copy(rj, adir)
    pv = os.path.join(sdir, "per_view.json")
    if os.path.exists(pv):
        shutil.copy(pv, adir)
    tdir = os.path.join(sdir, "test")
    if os.path.isdir(tdir):
        best = max(os.listdir(tdir), key=lambda d: int(d.rsplit("_", 1)[-1]))
        rdir = os.path.join(tdir, best, "renders")
        gdir = os.path.join(tdir, best, "gt")
        if os.path.isdir(rdir):
            for name in sorted(os.listdir(rdir))[:N_PAIRS]:
                shutil.copy(os.path.join(rdir, name),
                            os.path.join(adir, f"render_{best}_{name}"))
                g = os.path.join(gdir, name)
                if os.path.exists(g):
                    shutil.copy(g, os.path.join(adir, f"gt_{name}"))
    c = curves(sdir)
    if c:
        with open(os.path.join(adir, "train_curve.json"), "w") as f:
            json.dump(c, f)
    return json.load(open(rj))


def main():
    os.makedirs(ART, exist_ok=True)
    rows = []

    # lego: round-2 collected artifacts pass through
    lego_src = "artifacts/lego30k_r2"
    if os.path.isdir(lego_src):
        adir = os.path.join(ART, "lego")
        if os.path.isdir(adir):
            shutil.rmtree(adir)
        shutil.copytree(lego_src, adir)
        res = json.load(open(os.path.join(adir, "results.json")))
        for method, m in sorted(res.items()):
            rows.append(("lego", method.replace("ours_", ""), m["PSNR"],
                         m["SSIM"], "round 2, f32"))

    for scene, (sdir, prov) in sorted(SOURCES.items()):
        res = collect_scene(scene, sdir, os.path.join(ART, scene))
        if res is None:
            # render-dir metrics missing (e.g. the mic renders hit the
            # axon-transport outage at the end of round 4): fall back to
            # the training loop's own full-test-set eval from the train
            # log — same held-out cameras, PSNR only (no SSIM)
            log = os.path.join(sdir, "train_supervised.log")
            psnr = None
            if os.path.exists(log):
                import re as _re
                for l in open(log, errors="replace"):
                    m = _re.search(r"\[ITER (\d+)\] test: L1 \S+ PSNR (\S+)", l)
                    if m and m.group(1) in ("7000", "30000"):
                        adir = os.path.join(ART, scene)
                        os.makedirs(adir, exist_ok=True)
                        rows.append((scene, m.group(1), float(m.group(2)),
                                     float("nan"), prov + " (train-log eval)"))
                        psnr = m.group(2)
            if psnr is None:
                print(f"WARNING: {scene} has no results at {sdir}",
                      file=sys.stderr)
            else:
                c = curves(sdir)
                if c:
                    with open(os.path.join(ART, scene, "train_curve.json"), "w") as f:
                        json.dump(c, f)
            continue
        for method, m in sorted(res.items()):
            rows.append((scene, method.replace("ours_", ""), m["PSNR"],
                         m["SSIM"], prov))

    lines = [
        "# Round-4 NeRF-synthetic evidence: all 8 scenes at 30k",
        "",
        "PSNR/SSIM on the held-out test split, scored by metrics.py on the",
        "f32 parity renderer. LPIPS is null with",
        'LPIPS_status="weights_unavailable" (no VGG weights obtainable on',
        "this zero-egress image; conversion path proven in",
        "tests/test_lpips.py). Reference column: the 3DGS-paper 30k table",
        "that the reference's chart images track.",
        "",
        "| scene | iters | PSNR | SSIM | paper PSNR (30k) | trained in |",
        "|---|---|---|---|---|---|",
    ]
    order = {"30000": 0, "7000": 1}
    rows.sort(key=lambda r: (r[0], order.get(r[1], 2)))
    for scene, it, psnr, ssim, prov in rows:
        ref = REF_30K.get(scene)
        ssim_s = f"{ssim:.4f}" if ssim == ssim else "—"
        lines.append(
            f"| {scene} | {it} | {psnr:.2f} | {ssim_s} | "
            f"{ref if ref is not None else '—'} | {prov} |"
        )
    with open(os.path.join(ART, "SUMMARY.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    sys.exit(main())
