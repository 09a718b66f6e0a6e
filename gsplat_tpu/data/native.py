"""ctypes bindings for the native host runtime (native/libgsplat_native.so).

The native library accelerates the hot IO paths (binary PLY parse into SoA
float32, COLMAP binary parse) — the data-loader layer the reference keeps in
C++ (`GS-IRON/npu-1/loader.cpp`). Falls back to the pure-Python codecs in
`gsplat_tpu.data.ply` / `.colmap` when the library is absent or a file uses a
format the native path doesn't cover (ascii PLY).

Build: `make -C native` (auto-attempted once per process if the .so is
missing and a compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libgsplat_native.so")


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH) and os.path.exists(
        os.path.join(_NATIVE_DIR, "Makefile")
    ):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                capture_output=True, timeout=120, check=True,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    lib.gsplat_last_error.restype = ctypes.c_char_p
    lib.gsplat_ply_read.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.gsplat_ply_write.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.gsplat_colmap_points3d.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.gsplat_colmap_images.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_char_p,
    ]
    lib.gsplat_colmap_cameras.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def ply_read_columns(path):
    """Native PLY vertex parse -> (names list, dict name -> (N,) float32).

    Returns None if the native path is unavailable/unsupported for this file.
    """
    lib = _load()
    if lib is None:
        return None
    n_vert = ctypes.c_int64()
    n_props = ctypes.c_int32()
    name_buf = ctypes.create_string_buffer(16384)
    rc = lib.gsplat_ply_read(
        path.encode(), ctypes.byref(n_vert), ctypes.byref(n_props),
        name_buf, len(name_buf), None,
    )
    if rc != 0:
        return None
    names = name_buf.value.decode().split(",")
    out = np.empty((n_props.value, n_vert.value), np.float32)
    rc = lib.gsplat_ply_read(
        path.encode(), ctypes.byref(n_vert), ctypes.byref(n_props),
        name_buf, len(name_buf), _fptr(out),
    )
    if rc != 0:
        return None
    return names, {nm: out[i] for i, nm in enumerate(names)}


def ply_write_columns(path, names, cols) -> bool:
    """Native all-float PLY write; cols is (P, N) float32."""
    lib = _load()
    if lib is None:
        return False
    cols = np.ascontiguousarray(cols, np.float32)
    rc = lib.gsplat_ply_write(
        path.encode(), cols.shape[1], cols.shape[0], ",".join(names).encode(), _fptr(cols)
    )
    return rc == 0


def colmap_points3d(path):
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_int64()
    if lib.gsplat_colmap_points3d(path.encode(), ctypes.byref(n), None, None, None) != 0:
        return None
    xyz = np.empty((n.value, 3), np.float32)
    rgb = np.empty((n.value, 3), np.uint8)
    err = np.empty((n.value,), np.float32)
    rc = lib.gsplat_colmap_points3d(
        path.encode(), ctypes.byref(n), _fptr(xyz),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _fptr(err),
    )
    if rc != 0:
        return None
    return xyz, rgb, err


def colmap_images(path):
    """-> dict image_id -> (qvec, tvec, camera_id, name), or None."""
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_int64()
    nl = ctypes.c_int64()
    if lib.gsplat_colmap_images(path.encode(), ctypes.byref(n), ctypes.byref(nl), None, None, None) != 0:
        return None
    qt = np.empty((n.value, 7), np.float32)
    ids = np.empty((n.value, 2), np.int32)
    names_buf = ctypes.create_string_buffer(nl.value + 1)
    rc = lib.gsplat_colmap_images(
        path.encode(), ctypes.byref(n), ctypes.byref(nl), _fptr(qt),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), names_buf,
    )
    if rc != 0:
        return None
    names = names_buf.raw[: nl.value].decode().split("\n")[: n.value]
    return {
        int(ids[i, 0]): (
            qt[i, :4].astype(np.float64),
            qt[i, 4:].astype(np.float64),
            int(ids[i, 1]),
            names[i],
        )
        for i in range(n.value)
    }


def colmap_cameras(path):
    """-> dict camera_id -> (model_id, width, height, params), or None."""
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_int64()
    if lib.gsplat_colmap_cameras(path.encode(), ctypes.byref(n), None) != 0:
        return None
    out = np.empty((n.value, 12), np.float32)
    if lib.gsplat_colmap_cameras(path.encode(), ctypes.byref(n), _fptr(out)) != 0:
        return None
    return {
        int(out[i, 0]): (
            int(out[i, 1]), int(out[i, 2]), int(out[i, 3]), out[i, 4:].astype(np.float64)
        )
        for i in range(n.value)
    }
