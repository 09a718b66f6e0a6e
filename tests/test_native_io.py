"""Native C++ loaders vs the pure-Python codecs (oracle-style A/B)."""

import os
import struct
import tempfile

import numpy as np
import pytest

from gsplat_tpu.data import colmap as colmap_io
from gsplat_tpu.data import native
from gsplat_tpu.data import ply as ply_io

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_gaussian_ply_native_matches_python(rng, tmp_path):
    n = 500
    path = str(tmp_path / "g.ply")
    ply_io.save_gaussian_ply(
        path,
        rng.standard_normal((n, 3)).astype(np.float32),
        rng.standard_normal((n, 1, 3)).astype(np.float32),
        rng.standard_normal((n, 15, 3)).astype(np.float32),
        rng.standard_normal((n, 1)).astype(np.float32),
        rng.standard_normal((n, 3)).astype(np.float32),
        rng.standard_normal((n, 4)).astype(np.float32),
    )
    names, cols = native.ply_read_columns(path)
    v = ply_io.read_ply(path)["vertex"]
    assert names == list(v.dtype.names)
    for nm in names:
        np.testing.assert_array_equal(cols[nm], v[nm])


def _write_colmap_fixtures(d, rng):
    # cameras.bin: one PINHOLE camera
    with open(os.path.join(d, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
        f.write(struct.pack("<dddd", 500.0, 510.0, 320.0, 240.0))
    # images.bin: two images with 2D points to skip
    with open(os.path.join(d, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for iid, name in ((1, b"a.png"), (2, b"b.png")):
            f.write(struct.pack("<i", iid))
            f.write(struct.pack("<7d", 1, 0, 0, 0, 0.1 * iid, 0.2, 0.3))
            f.write(struct.pack("<i", 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 2))
            for _ in range(2):
                f.write(struct.pack("<ddq", 1.0, 2.0, 7))
    # points3D.bin: three points with tracks
    with open(os.path.join(d, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 3))
        for pid in range(3):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<3d", pid, pid + 0.5, -pid))
            f.write(bytes([10 * pid, 20, 30]))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<ii", 1, 0) + struct.pack("<ii", 2, 1))


def test_colmap_native_matches_python(rng, tmp_path):
    _write_colmap_fixtures(str(tmp_path), rng)
    cams = colmap_io.read_cameras_binary(str(tmp_path / "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 640
    np.testing.assert_allclose(cams[1].params, [500, 510, 320, 240])

    imgs = colmap_io.read_images_binary(str(tmp_path / "images.bin"))
    assert len(imgs) == 2
    assert imgs[2].name == "b.png"
    np.testing.assert_allclose(imgs[2].tvec, [0.2, 0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(imgs[1].qvec, [1, 0, 0, 0])

    xyz, rgb, err = colmap_io.read_points3d_binary(str(tmp_path / "points3D.bin"))
    np.testing.assert_allclose(xyz[2], [2, 2.5, -2])
    np.testing.assert_array_equal(rgb[1], [10, 20, 30])
    np.testing.assert_allclose(err, 0.5)


def test_snapshot_roundtrip_via_native(rng, tmp_path):
    """save_gaussian_ply -> load_gaussian_ply (native fast path) roundtrip."""
    n = 64
    arrs = dict(
        xyz=rng.standard_normal((n, 3)).astype(np.float32),
        features_dc=rng.standard_normal((n, 1, 3)).astype(np.float32),
        features_rest=rng.standard_normal((n, 15, 3)).astype(np.float32),
        opacity=rng.standard_normal((n, 1)).astype(np.float32),
        scaling=rng.standard_normal((n, 3)).astype(np.float32),
        rotation=rng.standard_normal((n, 4)).astype(np.float32),
    )
    path = str(tmp_path / "snap.ply")
    ply_io.save_gaussian_ply(
        path, arrs["xyz"], arrs["features_dc"], arrs["features_rest"],
        arrs["opacity"], arrs["scaling"], arrs["rotation"],
    )
    out = ply_io.load_gaussian_ply(path)
    for k in arrs:
        np.testing.assert_allclose(out[k], arrs[k], atol=1e-6, err_msg=k)
