"""COLMAP sparse-model parsers (binary + text).

Standalone reimplementation of the subset of the COLMAP model format the
reference consumes (`scene/colmap_loader.py:125-294`): camera intrinsics,
image extrinsics, and the 3D point cloud, in both `.bin` and `.txt` forms.
Parsing is numpy-vectorized where the record layout allows (points3D tracks
are skipped by offset arithmetic instead of per-point reads).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

# COLMAP camera model id -> (name, num_params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
_NAME_TO_ID = {name: mid for mid, (name, _) in CAMERA_MODELS.items()}


@dataclass(frozen=True)
class ColmapCamera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


@dataclass(frozen=True)
class ColmapImage:
    id: int
    qvec: np.ndarray  # (4,) wxyz
    tvec: np.ndarray  # (3,)
    camera_id: int
    name: str
    xys: np.ndarray  # (M, 2)
    point3d_ids: np.ndarray  # (M,)


def qvec2rotmat(qvec):
    """Quaternion (wxyz) -> rotation matrix, same element layout as the
    reference (`colmap_loader.py:43-55`)."""
    w, x, y, z = qvec
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
            [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
            [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def rotmat2qvec(R):
    """Rotation matrix -> quaternion (wxyz); inverse of qvec2rotmat."""
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = np.array([
        [Rxx - Ryy - Rzz, 0, 0, 0],
        [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
        [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
        [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
    ]) / 3.0
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec = -qvec
    return qvec


def read_cameras_binary(path) -> dict:
    from gsplat_tpu.data import native

    nat = native.colmap_cameras(path)
    if nat is not None:
        out = {}
        for cam_id, (model_id, width, height, params) in nat.items():
            name, n_params = CAMERA_MODELS[model_id]
            out[cam_id] = ColmapCamera(cam_id, name, width, height, params[:n_params])
        return out
    with open(path, "rb") as f:
        data = f.read()
    (num,) = struct.unpack_from("<Q", data, 0)
    off = 8
    out = {}
    for _ in range(num):
        cam_id, model_id, width, height = struct.unpack_from("<iiQQ", data, off)
        off += 24
        name, n_params = CAMERA_MODELS[model_id]
        params = np.frombuffer(data, dtype="<f8", count=n_params, offset=off).copy()
        off += 8 * n_params
        out[cam_id] = ColmapCamera(cam_id, name, int(width), int(height), params)
    return out


def read_images_binary(path) -> dict:
    from gsplat_tpu.data import native

    nat = native.colmap_images(path)
    if nat is not None:
        empty_xys = np.zeros((0, 2))
        empty_ids = np.zeros((0,), np.int64)
        return {
            iid: ColmapImage(iid, qvec, tvec, cam_id, name, empty_xys, empty_ids)
            for iid, (qvec, tvec, cam_id, name) in nat.items()
        }
    with open(path, "rb") as f:
        data = f.read()
    (num,) = struct.unpack_from("<Q", data, 0)
    off = 8
    out = {}
    for _ in range(num):
        image_id = struct.unpack_from("<i", data, off)[0]
        off += 4
        qt = np.frombuffer(data, dtype="<f8", count=7, offset=off).copy()
        off += 56
        (camera_id,) = struct.unpack_from("<i", data, off)
        off += 4
        end = data.index(b"\x00", off)
        name = data[off:end].decode("utf-8")
        off = end + 1
        (n_pts,) = struct.unpack_from("<Q", data, off)
        off += 8
        rec = np.frombuffer(data, dtype="<f8", count=3 * n_pts, offset=off)
        xys = rec.reshape(-1, 3)[:, :2].copy()
        ids = (
            np.frombuffer(data, dtype="<i8", count=3 * n_pts, offset=off)
            .reshape(-1, 3)[:, 2]
            .copy()
        )
        off += 24 * n_pts
        out[image_id] = ColmapImage(image_id, qt[:4], qt[4:], camera_id, name, xys, ids)
    return out


def read_points3d_binary(path):
    """-> (xyz (N,3) f64, rgb (N,3) u8, error (N,)) like `colmap_loader.py:125`."""
    from gsplat_tpu.data import native

    nat = native.colmap_points3d(path)
    if nat is not None:
        return nat
    with open(path, "rb") as f:
        data = f.read()
    (num,) = struct.unpack_from("<Q", data, 0)
    off = 8
    xyz = np.empty((num, 3), np.float64)
    rgb = np.empty((num, 3), np.uint8)
    err = np.empty((num,), np.float64)
    for i in range(num):
        # id(8) xyz(24) rgb(3) error(8) = 43 bytes fixed header
        xyz[i] = np.frombuffer(data, "<f8", count=3, offset=off + 8)
        rgb[i] = np.frombuffer(data, "u1", count=3, offset=off + 32)
        err[i] = struct.unpack_from("<d", data, off + 35)[0]
        (track_len,) = struct.unpack_from("<Q", data, off + 43)
        off += 51 + 8 * track_len
    return xyz, rgb, err


def read_cameras_text(path) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cam_id, model = int(parts[0]), parts[1]
            width, height = int(parts[2]), int(parts[3])
            params = np.array([float(x) for x in parts[4:]])
            out[cam_id] = ColmapCamera(cam_id, model, width, height, params)
    return out


def read_images_text(path) -> dict:
    out = {}
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    for i in range(0, len(lines), 2):
        parts = lines[i].split()
        image_id = int(parts[0])
        qvec = np.array([float(x) for x in parts[1:5]])
        tvec = np.array([float(x) for x in parts[5:8]])
        camera_id = int(parts[8])
        name = parts[9]
        elems = lines[i + 1].split() if i + 1 < len(lines) else []
        xys = np.array([float(x) for x in elems], dtype=np.float64)
        if xys.size:
            xys = xys.reshape(-1, 3)
            pids = xys[:, 2].astype(np.int64)
            xys = xys[:, :2]
        else:
            xys = np.zeros((0, 2))
            pids = np.zeros((0,), np.int64)
        out[image_id] = ColmapImage(image_id, qvec, tvec, camera_id, name, xys, pids)
    return out


def read_points3d_text(path):
    xyz_l, rgb_l, err_l = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            xyz_l.append([float(x) for x in parts[1:4]])
            rgb_l.append([int(x) for x in parts[4:7]])
            err_l.append(float(parts[7]))
    return (
        np.asarray(xyz_l, np.float64),
        np.asarray(rgb_l, np.uint8),
        np.asarray(err_l, np.float64),
    )
