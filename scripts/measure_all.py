#!/usr/bin/env python
"""One-claim measurement sweep: stage profile + micro attribution, headline
bench, and gaussian-count scaling, all in one process (one TPU claim, warm
pipeline — fresh-process microbenchmarks lie on this image)."""

import os
import runpy
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run(path, extra=()):
    print(f"\n===== {path} {' '.join(extra)} =====", flush=True)
    saved = sys.argv
    sys.argv = [path] + list(extra)
    try:
        runpy.run_path(os.path.join(ROOT, path), run_name="__main__")
    finally:
        sys.argv = saved


def main():
    run("scripts/profile_stages.py", ("--micro",))
    run("bench.py")
    run("scripts/bench_scale.py")


if __name__ == "__main__":
    main()
