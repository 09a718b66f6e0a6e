"""COLMAP path end-to-end: synthetic sparse model -> reader -> llffhold
split -> training -> render (reference behavior being re-created:
`scene/dataset_readers.py:145-226` + the full `train.py` stack over it).

The binary parser alone is covered in test_native_io.py; this exercises the
WHOLE chain the reference drives for MipNeRF360/T&T-style scenes — reading
cameras.bin/images.bin/points3D.bin, converting (qvec, tvec) to the
transposed-R camera convention, writing points3D.ply, the every-8th-name
eval split, and a short optimization that must reduce the loss.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from scripts.make_fixtures import make_colmap_scene


@pytest.fixture(scope="module")
def colmap_scene(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("colmap") / "scene")
    make_colmap_scene(d)
    return d


def test_reader_llffhold_split(colmap_scene):
    from gsplat_tpu.data.readers import read_scene_info

    info = read_scene_info(colmap_scene, eval=True)
    assert not info.is_nerf_synthetic
    # llffhold=8 on 12 name-sorted images -> indices 0 and 8 held out
    assert len(info.test_cameras) == 2
    assert len(info.train_cameras) == 10
    assert {c.image_name for c in info.test_cameras} == {"r_000.png", "r_008.png"}
    # reader converts bin -> points3D.ply on first touch (dataset_readers.py:205-218)
    assert os.path.exists(os.path.join(colmap_scene, "sparse/0/points3D.ply"))
    assert info.points.shape == (300, 3)
    assert info.nerf_normalization["radius"] > 0
    cam = info.train_cameras[0]
    # R is stored TRANSPOSED from the world-to-cam rotation (the glm
    # convention quirk, dataset_readers.py:196) => R itself is cam-to-world
    np.testing.assert_allclose(cam.R @ cam.R.T, np.eye(3), atol=1e-6)
    assert 0 < cam.fovx < np.pi and 0 < cam.fovy < np.pi


def test_colmap_train_render_end_to_end(colmap_scene, tmp_path):
    import render as render_cli
    import train as train_cli
    from gsplat_tpu.train import loop as train_loop

    model_dir = str(tmp_path / "model")
    losses = []
    orig_train = train_loop.train

    def capture_train(*a, **kw):
        kw["on_iteration"] = lambda it, state, m: losses.append(float(m["loss"]))
        return orig_train(*a, **kw)

    train_loop.train = capture_train
    try:
        rc = train_cli.main(
            [
                "-s", colmap_scene, "-m", model_dir, "--eval",
                "--iterations", "60", "--sh_degree", "1",
                "--backend", "jnp", "--instance_capacity", str(1 << 13),
                "--max_per_tile", "256", "--capacity", "512",
                "--test_iterations", "60", "--save_iterations", "60",
                "--disable_viewer", "--quiet",
            ]
        )
    finally:
        train_loop.train = orig_train
    assert rc == 0
    assert len(losses) == 60 and all(np.isfinite(l) for l in losses)
    # optimization must actually bite on the COLMAP scene
    assert np.mean(losses[-10:]) < 0.8 * np.mean(losses[:10])

    rc = render_cli.main(
        [
            "-m", model_dir, "-s", colmap_scene,
            "--backend", "jnp", "--instance_capacity", str(1 << 13),
            "--max_per_tile", "256", "--skip_train",
        ]
    )
    assert rc == 0
    out_dir = os.path.join(model_dir, "test", "ours_60")
    renders = sorted(os.listdir(os.path.join(out_dir, "renders")))
    assert len(renders) == 2  # the two held-out views
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(out_dir, "renders", renders[0])))
    assert img.shape == (64, 96, 3) and img.max() > 0


def test_model_writer_roundtrip(colmap_scene, tmp_path):
    """write_model -> read back must reproduce the model exactly, in both
    binary and text forms (the writer half of the reference's
    `utils/read_write_model.py:106-521`)."""
    from gsplat_tpu.data import colmap as C

    src = os.path.join(colmap_scene, "sparse", "0")
    cams = C.read_cameras_binary(os.path.join(src, "cameras.bin"))
    imgs = C.read_images_binary(os.path.join(src, "images.bin"))
    pts = C.read_points3d_binary(os.path.join(src, "points3D.bin"))

    for ext, readers in (
        (".bin", (C.read_cameras_binary, C.read_images_binary,
                  C.read_points3d_binary)),
        (".txt", (C.read_cameras_text, C.read_images_text,
                  C.read_points3d_text)),
    ):
        out = str(tmp_path / ("model" + ext.strip(".")))
        C.write_model(cams, imgs, pts, out, ext=ext)
        rc_cams = readers[0](os.path.join(out, "cameras" + ext))
        rc_imgs = readers[1](os.path.join(out, "images" + ext))
        rc_pts = readers[2](os.path.join(out, "points3D" + ext))
        assert set(rc_cams) == set(cams)
        for cid in cams:
            assert rc_cams[cid].model == cams[cid].model
            assert rc_cams[cid].width == cams[cid].width
            np.testing.assert_allclose(rc_cams[cid].params, cams[cid].params)
        assert set(rc_imgs) == set(imgs)
        for iid in imgs:
            np.testing.assert_allclose(rc_imgs[iid].qvec, imgs[iid].qvec)
            np.testing.assert_allclose(rc_imgs[iid].tvec, imgs[iid].tvec)
            assert rc_imgs[iid].name == imgs[iid].name
            assert rc_imgs[iid].camera_id == imgs[iid].camera_id
        np.testing.assert_allclose(rc_pts[0], pts[0])
        np.testing.assert_array_equal(rc_pts[1], pts[1])
        np.testing.assert_allclose(rc_pts[2], pts[2])


def test_gaussian_gt_fixture_roundtrip(tmp_path):
    """The round-5 quality fixture (make_colmap_gaussian_scene) must be
    self-consistent: its GT PNGs are rendered from a known gaussian cloud
    through OUR reader's cameras, so re-loading the scene and re-rendering
    that cloud from a loaded camera must reproduce the saved PNG to within
    8-bit quantization. Guards the 39.56-PSNR COLMAP quality run's premise
    (reference chain: scene/dataset_readers.py:145-226)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from scripts.make_fixtures import make_colmap_gaussian_scene
    from gsplat_tpu.core.types import GaussianParams, make_render_settings
    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.render import render

    d = str(tmp_path / "scene")
    make_colmap_gaussian_scene(d, n_gauss=256, n_points=128, n_images=4,
                               width=96, height=64, focal=90.0, seed=7)

    scene = Scene(d, model_path=None, images="images", depths="",
                  resolution=-1, white_background=False, eval=False,
                  train_test_exp=False, shuffle=False)
    cams = scene.get_train_cameras()
    assert len(cams) == 4

    # regenerate the same cloud (same seed) the fixture rendered
    n = 256
    g = np.random.default_rng(7)
    xyz = g.normal(0, 0.45, (n, 3))
    log_scaling = np.log(g.uniform(0.015, 0.09, (n, 3)))
    rotation = g.normal(size=(n, 4))
    rotation /= np.linalg.norm(rotation, axis=1, keepdims=True)
    logit_opacity = g.uniform(0.5, 3.0, (n, 1))
    color = np.clip(xyz * 0.5 + 0.5 + g.normal(0, 0.08, (n, 3)), 0, 1)
    from gsplat_tpu.core.sh import rgb_to_sh

    params = GaussianParams(
        xyz=jnp.asarray(xyz, jnp.float32),
        features_dc=jnp.asarray(rgb_to_sh(color)[:, None, :], jnp.float32),
        features_rest=jnp.zeros((n, 15, 3), jnp.float32),
        scaling=jnp.asarray(log_scaling, jnp.float32),
        rotation=jnp.asarray(rotation, jnp.float32),
        opacity=jnp.asarray(logit_opacity, jnp.float32),
    )
    alive = jnp.ones(n, bool)
    settings = make_render_settings(sh_degree=3, backend="jnp")
    holder = cams[0]
    img = np.asarray(
        render(holder.camera, params, alive, settings, jnp.zeros(3))["render"]
    )
    saved = np.asarray(
        Image.open(os.path.join(d, "images", "r_000.png")), dtype=np.float32
    ) / 255.0
    # loaded GT is also exposed on the holder; all three must agree
    assert np.abs(np.clip(img, 0, 1) - saved).max() <= (1.5 / 255.0)
    assert np.abs(holder.image - saved).max() <= (1.0 / 255.0)
