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


def make_colmap_scene(
    out_dir: str,
    n_points: int = 300,
    n_images: int = 12,
    width: int = 96,
    height: int = 64,
    focal: float = 100.0,
    seed: int = 0,
):
    """Write a tiny synthetic COLMAP scene (sparse/0/*.bin + images/*.png).

    The on-disk shape `read_colmap_scene_info` consumes
    (reference behavior: `scene/dataset_readers.py:145-226`,
    `colmap_loader.py:125-294`): a PINHOLE camera, a ring of world-to-cam
    poses stored as (qvec, tvec), a colored 3D point cloud, and per-view
    ground-truth PNGs rendered from those points by a z-buffered disc
    splatter — enough signal for a short training run to reduce loss.
    """
    import struct

    from PIL import Image

    from gsplat_tpu.data.colmap import rotmat2qvec

    rng = np.random.default_rng(seed)
    sparse = os.path.join(out_dir, "sparse", "0")
    images_dir = os.path.join(out_dir, "images")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(images_dir, exist_ok=True)

    # colored point cloud in a unit ball
    pts = rng.normal(0, 0.45, (n_points, 3))
    pts = pts[np.argsort(pts[:, 2])]  # stable draw order for the splatter
    colors = (np.clip(pts * 0.5 + 0.5, 0, 1) * 255).astype(np.uint8)

    cx, cy = width / 2.0, height / 2.0
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, width, height))  # PINHOLE
        f.write(struct.pack("<dddd", focal, focal, cx, cy))

    poses = []
    for i in range(n_images):
        ang = 2 * np.pi * i / n_images
        p = np.array([4.0 * np.cos(ang), 4.0 * np.sin(ang), 1.2])
        z = -p / np.linalg.norm(p)  # camera looks at the origin
        x = np.cross([0.0, 0.0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])  # world -> cam rows
        t = -R @ p
        poses.append((R, t))

    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i, (R, t) in enumerate(poses):
            name = f"r_{i:03d}.png".encode()
            qvec = rotmat2qvec(R)
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<7d", *qvec, *t))
            f.write(struct.pack("<i", 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 0))

    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_points))
        for pid in range(n_points):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<3d", *pts[pid]))
            f.write(bytes(colors[pid]))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))

    # ground truth: z-buffered disc splat of the points (far-to-near paint)
    for i, (R, t) in enumerate(poses):
        cam = pts @ R.T + t
        order = np.argsort(-cam[:, 2])
        img = np.zeros((height, width, 3), np.uint8)
        yy, xx = np.mgrid[-2:3, -2:3]
        disc = (yy * yy + xx * xx) <= 4
        for j in order:
            X, Y, Z = cam[j]
            if Z <= 0.2:
                continue
            u = int(round(focal * X / Z + cx))
            v = int(round(focal * Y / Z + cy))
            for dy, dx in zip(*np.nonzero(disc)):
                py, px = v + dy - 2, u + dx - 2
                if 0 <= py < height and 0 <= px < width:
                    img[py, px] = colors[j]
        Image.fromarray(img).save(os.path.join(images_dir, f"r_{i:03d}.png"))

    return out_dir


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="tests/fixtures")
    parser.add_argument(
        "--colmap", action="store_true",
        help="also write the synthetic COLMAP scene under <out>/colmap_scene",
    )
    args = parser.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    ply_io.save_gaussian_ply(os.path.join(args.out, "single_gaussian.ply"), *single_gaussian())
    ply_io.save_gaussian_ply(os.path.join(args.out, "two_gaussians.ply"), *two_gaussians())
    if args.colmap:
        make_colmap_scene(os.path.join(args.out, "colmap_scene"))
    print(f"wrote fixtures to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
