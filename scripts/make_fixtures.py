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


def make_colmap_gaussian_scene(
    out_dir: str,
    n_gauss: int = 4096,
    n_points: int = 2048,
    n_images: int = 64,
    width: int = 400,
    height: int = 304,
    focal: float = 380.0,
    seed: int = 3,
):
    """Synthetic COLMAP scene whose ground truth IS a gaussian render.

    The round-4/5 disc-splat proxy capped at ~17 dB because its GT images
    are z-buffered FIXED-SIZE screen-space discs — not 3D-consistent and
    outside any splatting model class, so low PSNR measured the fixture,
    not the trainer. Here the GT comes from a known gaussian cloud:
    COLMAP bins are written first (PINHOLE camera ring, reference layout
    `scene/dataset_readers.py:145-226`), the scene is loaded back through
    OUR OWN reader (`gsplat_tpu/data/colmap.py`), and each view is
    rendered with the f32 jnp path from the loaded cameras — so pose
    conventions are certified round-trip and a correct COLMAP pipeline +
    trainer can approach the GT closely. points3D is an SfM-like noisy
    subset of the gaussian centers (the trainer's real init path).
    """
    import struct

    from PIL import Image

    from gsplat_tpu.data.colmap import rotmat2qvec

    rng = np.random.default_rng(seed)
    sparse = os.path.join(out_dir, "sparse", "0")
    images_dir = os.path.join(out_dir, "images")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(images_dir, exist_ok=True)

    # --- GT gaussian cloud: smooth blobs in a unit ball, opaque-ish,
    # view-independent color (training still ramps SH; rest stays ~0)
    xyz = rng.normal(0, 0.45, (n_gauss, 3))
    log_scaling = np.log(rng.uniform(0.015, 0.09, (n_gauss, 3)))
    rotation = rng.normal(size=(n_gauss, 4))
    rotation /= np.linalg.norm(rotation, axis=1, keepdims=True)
    logit_opacity = rng.uniform(0.5, 3.0, (n_gauss, 1))
    color = np.clip(xyz * 0.5 + 0.5 + rng.normal(0, 0.08, (n_gauss, 3)), 0, 1)
    features_dc = rgb_to_sh(color)[:, None, :]

    cx, cy = width / 2.0, height / 2.0
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, width, height))  # PINHOLE
        f.write(struct.pack("<dddd", focal, focal, cx, cy))

    poses = []
    for i in range(n_images):
        ang = 2 * np.pi * i / n_images
        elev = 0.6 + 0.8 * ((i * 7) % n_images) / n_images  # vary height
        p = np.array([3.5 * np.cos(ang), 3.5 * np.sin(ang), elev])
        z = -p / np.linalg.norm(p)
        x = np.cross([0.0, 0.0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
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

    # SfM-like sparse init: noisy subset of gaussian centers + colors
    sel = rng.choice(n_gauss, size=min(n_points, n_gauss), replace=False)
    pts = xyz[sel] + rng.normal(0, 0.01, (len(sel), 3))
    pcol = (color[sel] * 255).astype(np.uint8)
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", len(sel)))
        for pid in range(len(sel)):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<3d", *pts[pid]))
            f.write(bytes(pcol[pid]))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))

    # placeholder images so the reader can build the camera list
    blank = Image.fromarray(np.zeros((height, width, 3), np.uint8))
    for i in range(n_images):
        blank.save(os.path.join(images_dir, f"r_{i:03d}.png"))

    # --- round-trip: load through our reader, render GT per loaded camera
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gsplat_tpu.core.types import GaussianParams, make_render_settings
    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.render import render

    params = GaussianParams(
        xyz=jnp.asarray(xyz, jnp.float32),
        features_dc=jnp.asarray(features_dc, jnp.float32),
        features_rest=jnp.zeros((n_gauss, 15, 3), jnp.float32),
        scaling=jnp.asarray(log_scaling, jnp.float32),
        rotation=jnp.asarray(rotation, jnp.float32),
        opacity=jnp.asarray(logit_opacity, jnp.float32),
    )
    alive = jnp.ones(n_gauss, bool)
    settings = make_render_settings(sh_degree=3, backend="jnp")
    scene = Scene(out_dir, model_path=None, images="images", depths="",
                  resolution=-1, white_background=False, eval=False,
                  train_test_exp=False, shuffle=False)
    fwd = jax.jit(
        lambda c, p, a: render(c, p, a, settings, jnp.zeros(3))["render"]
    )
    for holder in scene.get_train_cameras():
        img = np.asarray(fwd(holder.camera, params, alive))
        img8 = (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
        name = holder.image_name
        if not name.endswith(".png"):
            name += ".png"
        Image.fromarray(img8).save(os.path.join(images_dir, name))
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
