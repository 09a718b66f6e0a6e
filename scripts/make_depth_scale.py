#!/usr/bin/env python
"""Fit per-image scale/offset aligning mono-depth maps to COLMAP sparse depth.

Behavioral port of the reference tool (`utils/make_depth_scale.py:8-95`):
project each image's registered 3D points to inverse depths, sample the
16-bit inverse mono-depth PNG at the 2D feature locations (bilinear), and
robust-fit (median/mean-abs-dev matching) scale+offset. Writes
`sparse/0/depth_params.json` consumed by the dataset reader
(`gsplat_tpu/data/readers.py`). numpy + PIL only (no cv2/joblib here).
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gsplat_tpu.data import colmap as colmap_io


def read_points3d_with_ids(path):
    """(ids (N,), xyz (N,3)) from points3D.bin (tool needs the id mapping)."""
    with open(path, "rb") as f:
        data = f.read()
    (num,) = struct.unpack_from("<Q", data, 0)
    off = 8
    ids = np.empty(num, np.int64)
    xyz = np.empty((num, 3), np.float64)
    for i in range(num):
        ids[i] = struct.unpack_from("<Q", data, off)[0]
        xyz[i] = np.frombuffer(data, "<f8", count=3, offset=off + 8)
        (track_len,) = struct.unpack_from("<Q", data, off + 43)
        off += 51 + 8 * track_len
    return ids, xyz


def bilinear_sample(img, xy):
    """Sample (H, W) img at float (M, 2) xy with border replication."""
    h, w = img.shape
    x = np.clip(xy[:, 0], 0, w - 1)
    y = np.clip(xy[:, 1], 0, h - 1)
    x0 = np.floor(x).astype(int)
    y0 = np.floor(y).astype(int)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = x - x0
    fy = y - y0
    return (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x1] * fx * (1 - fy)
        + img[y1, x0] * (1 - fx) * fy
        + img[y1, x1] * fx * fy
    )


def get_scale(image, camera, points3d_ordered, depths_dir):
    from PIL import Image

    pts_idx = image.point3d_ids
    mask = (pts_idx >= 0) & (pts_idx < len(points3d_ordered))
    pts_idx = pts_idx[mask]
    valid_xys = image.xys[mask]
    pts = points3d_ordered[pts_idx] if len(pts_idx) else np.zeros((1, 3))

    R = colmap_io.qvec2rotmat(image.qvec)
    pts_cam = pts @ R.T + image.tvec
    invcolmapdepth = 1.0 / pts_cam[..., 2]

    stem = image.name[: -(len(image.name.split(".")[-1]) + 1)]
    depth_path = os.path.join(depths_dir, f"{stem}.png")
    if not os.path.exists(depth_path):
        return None
    with Image.open(depth_path) as dimg:
        invmono = np.asarray(dimg, np.float32)
    if invmono.ndim != 2:
        invmono = invmono[..., 0]
    invmono = invmono / float(2**16)

    s = invmono.shape[0] / camera.height
    maps = (valid_xys * s).astype(np.float32)
    valid = (
        (maps[..., 0] >= 0)
        & (maps[..., 1] >= 0)
        & (maps[..., 0] < camera.width * s)
        & (maps[..., 1] < camera.height * s)
        & (invcolmapdepth > 0)
    )
    if valid.sum() > 10 and (invcolmapdepth.max() - invcolmapdepth.min()) > 1e-3:
        invcol = invcolmapdepth[valid]
        sampled = bilinear_sample(invmono, maps[valid])
        t_colmap = np.median(invcol)
        s_colmap = np.mean(np.abs(invcol - t_colmap))
        t_mono = np.median(sampled)
        s_mono = np.mean(np.abs(sampled - t_mono))
        scale = s_colmap / s_mono if s_mono > 0 else 0.0
        offset = t_colmap - t_mono * scale
    else:
        scale, offset = 0.0, 0.0
    return {"image_name": stem, "scale": float(scale), "offset": float(offset)}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_dir", required=True)
    parser.add_argument("--depths_dir", required=True)
    args = parser.parse_args(argv)

    sparse = os.path.join(args.base_dir, "sparse", "0")
    # NOTE: uses the python parsers directly — this tool needs the per-image
    # 2D observations that the fast native path skips
    cameras = colmap_io.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    with open(os.path.join(sparse, "images.bin"), "rb"):
        pass
    # bypass the native fast path (it drops xys)
    from gsplat_tpu.data import native

    orig = native.colmap_images
    native.colmap_images = lambda p: None
    try:
        images = colmap_io.read_images_binary(os.path.join(sparse, "images.bin"))
    finally:
        native.colmap_images = orig

    ids, xyz = read_points3d_with_ids(os.path.join(sparse, "points3D.bin"))
    points3d_ordered = np.zeros((ids.max() + 1, 3))
    points3d_ordered[ids] = xyz

    depth_params = {}
    for key in images:
        r = get_scale(images[key], cameras[images[key].camera_id], points3d_ordered, args.depths_dir)
        if r is not None:
            depth_params[r["image_name"]] = {"scale": r["scale"], "offset": r["offset"]}

    with open(os.path.join(sparse, "depth_params.json"), "w") as f:
        json.dump(depth_params, f, indent=2)
    print(f"wrote depth_params.json for {len(depth_params)} images")
    return 0


if __name__ == "__main__":
    sys.exit(main())
