#!/usr/bin/env python
"""Full evaluation harness (reference `full_eval.py:16-112`): trains, renders
and evaluates the 13 standard scenes (MipNeRF360 x9, Tanks&Temples x2,
DeepBlending x2), writing per-scene model dirs + timing.txt."""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

mipnerf360_outdoor_scenes = ["bicycle", "flowers", "garden", "stump", "treehill"]
mipnerf360_indoor_scenes = ["room", "counter", "kitchen", "bonsai"]
tanks_and_temples_scenes = ["truck", "train"]
deep_blending_scenes = ["drjohnson", "playroom"]
# the dataset the reference bundles in-repo (`nerf_synthetic/README.txt`) —
# not part of its 13-scene harness, but the only one always available
nerf_synthetic_scenes = [
    "chair", "drums", "ficus", "hotdog", "lego", "materials", "mic", "ship",
]


def main(argv=None):
    parser = ArgumentParser(description="Full evaluation script parameters")
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--output_path", default="./eval")
    parser.add_argument("--mipnerf360", "-m360", type=str, default=None)
    parser.add_argument("--tanksandtemples", "-tat", type=str, default=None)
    parser.add_argument("--deepblending", "-db", type=str, default=None)
    parser.add_argument(
        "--synthetic", "-ns", type=str, default=None,
        help="NeRF-synthetic root (white background, 800x800 Blender scenes)",
    )
    parser.add_argument(
        "--scenes", nargs="+", type=str, default=None,
        help="restrict to these scene names",
    )
    parser.add_argument(
        "--iterations", type=int, default=30000,
        help="training iterations per scene (test/render at 7000 and this)",
    )
    parser.add_argument("--backend", type=str, default="pallas")
    args, _ = parser.parse_known_args(argv)

    scenes = []
    if args.mipnerf360:
        scenes += [
            (os.path.join(args.mipnerf360, s), "images_4", s)
            for s in mipnerf360_outdoor_scenes
        ]
        scenes += [
            (os.path.join(args.mipnerf360, s), "images_2", s)
            for s in mipnerf360_indoor_scenes
        ]
    if args.tanksandtemples:
        scenes += [
            (os.path.join(args.tanksandtemples, s), None, s)
            for s in tanks_and_temples_scenes
        ]
    if args.deepblending:
        scenes += [
            (os.path.join(args.deepblending, s), None, s) for s in deep_blending_scenes
        ]
    if args.synthetic:
        scenes += [
            (os.path.join(args.synthetic, s), None, s)
            for s in nerf_synthetic_scenes
        ]
    if args.scenes:
        scenes = [sc for sc in scenes if sc[2] in set(args.scenes)]
    if not scenes:
        parser.error("pass at least one of -m360 / -tat / -db / -ns dataset roots")

    os.makedirs(args.output_path, exist_ok=True)

    if not args.skip_training:
        import time

        iters = sorted({7000, args.iterations})
        iters_s = " ".join(str(i) for i in iters)
        # no --quiet: the per-10-iteration progress lines double as the
        # stall watchdog's liveness signal (train_supervised.py)
        common = (
            f" --eval --iterations {args.iterations}"
            f" --test_iterations {iters_s} --save_iterations {iters_s} "
            f"--backend {args.backend} --disable_viewer --checkpoint_every 500"
        )
        start = time.time()
        for src, images, name in scenes:
            img_flag = f" -i {images}" if images else ""
            white = " -w" if args.synthetic and src.startswith(args.synthetic) else ""
            # 900s stall window: a mid-run capacity-growth recompile through
            # the remote-compile relay can legitimately stay silent >600s
            rc = os.system(
                f"{sys.executable} scripts/train_supervised.py --stall_timeout 900 "
                f"-- -s {src}{img_flag}{white} -m {args.output_path}/{name}{common}"
            )
            if rc != 0:
                print(f"training failed for {name} (rc={rc})", file=sys.stderr)
        with open(os.path.join(args.output_path, "timing.txt"), "w") as f:
            f.write(f"{(time.time() - start) / 60.0} minutes")

    if not args.skip_rendering:
        for src, images, name in scenes:
            for it in sorted({7000, args.iterations}):
                os.system(
                    f"{sys.executable} render.py --iteration {it} "
                    f"-s {src} -m {args.output_path}/{name} --eval --skip_train"
                )

    if not args.skip_metrics:
        paths = " ".join(f"{args.output_path}/{name}" for _, _, name in scenes)
        os.system(f"{sys.executable} metrics.py -m {paths}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
