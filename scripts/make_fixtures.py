#!/usr/bin/env python
"""Deterministic 1- and 2-gaussian fixture scenes for visual/numeric tests.

The analogue of the reference's fixture generators
(`GS-IRON/npu-1/gaussian.py:80-92`, `gaussian2.py:70-87`): hand-picked
parameter values written in the model snapshot layout, so a renderer change
can be eyeballed/diffed against a known-good image.

    python scripts/make_fixtures.py --out tests/fixtures
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gsplat_tpu.core.sh import rgb_to_sh
from gsplat_tpu.data import ply as ply_io


def single_gaussian():
    xyz = np.array([[0.0, 0.0, 0.0]], np.float32)
    f_dc = rgb_to_sh(np.array([[[1.0, 0.2, 0.2]]], np.float32))
    f_rest = np.zeros((1, 15, 3), np.float32)
    opacity = np.array([[4.0]], np.float32)  # sigmoid -> 0.982
    scaling = np.log(np.array([[0.5, 0.25, 0.125]], np.float32))
    rotation = np.array([[0.924, 0.0, 0.383, 0.0]], np.float32)  # 45 deg about y
    return xyz, f_dc, f_rest, opacity, scaling, rotation


def two_gaussians():
    xyz = np.array([[-0.5, 0.0, 0.0], [0.5, 0.1, 0.6]], np.float32)
    f_dc = rgb_to_sh(
        np.array([[[0.2, 0.9, 0.2]], [[0.2, 0.2, 0.9]]], np.float32)
    )
    f_rest = np.zeros((2, 15, 3), np.float32)
    opacity = np.array([[2.0], [1.0]], np.float32)
    scaling = np.log(np.array([[0.4, 0.4, 0.2], [0.3, 0.5, 0.25]], np.float32))
    rotation = np.array(
        [[1.0, 0.0, 0.0, 0.0], [0.924, 0.383, 0.0, 0.0]], np.float32
    )
    return xyz, f_dc, f_rest, opacity, scaling, rotation


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="tests/fixtures")
    args = parser.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    ply_io.save_gaussian_ply(os.path.join(args.out, "single_gaussian.ply"), *single_gaussian())
    ply_io.save_gaussian_ply(os.path.join(args.out, "two_gaussians.ply"), *two_gaussians())
    print(f"wrote fixtures to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
