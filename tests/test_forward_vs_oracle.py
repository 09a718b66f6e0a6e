"""Forward rasterization vs. the independent numpy oracle.

BASELINE.json config 1: random Gaussians, small render, forward allclose
against the reference math (here: the scalar numpy transcription in
tests/oracle/reference_math.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gsplat_tpu.core.types import Camera, GaussianParams, make_render_settings
from gsplat_tpu.ops.binning import bin_gaussians
from gsplat_tpu.ops.projection import preprocess
from gsplat_tpu.render import grid_dims, render
from tests.oracle.reference_math import make_test_scene, render_oracle


def scene_to_inputs(sc):
    k = sc["features"].shape[1]
    params = GaussianParams(
        xyz=jnp.asarray(sc["xyz"]),
        features_dc=jnp.asarray(sc["features"][:, :1, :]),
        features_rest=jnp.asarray(sc["features"][:, 1:, :]),
        scaling=jnp.asarray(sc["log_scaling"]),
        rotation=jnp.asarray(sc["rotation"]),
        opacity=jnp.asarray(sc["logit_opacity"]),
    )
    camera = Camera(
        world_view=jnp.asarray(sc["world_view"]),
        full_proj=jnp.asarray(sc["full_proj"]),
        camera_center=jnp.asarray(sc["cam_center"]),
        tan_fovx=jnp.float32(sc["tan_fovx"]),
        tan_fovy=jnp.float32(sc["tan_fovy"]),
        width=sc["width"],
        height=sc["height"],
    )
    alive = jnp.ones(sc["xyz"].shape[0], bool)
    return params, camera, alive


@pytest.mark.parametrize("antialiasing", [False, True])
def test_preprocess_matches_oracle(rng, antialiasing):
    sc = make_test_scene(rng)
    params, camera, alive = scene_to_inputs(sc)
    settings = make_render_settings(
        sh_degree=sc["sh_degree"], antialiasing=antialiasing
    )
    gx, gy = grid_dims(camera, settings.tile)

    screen = preprocess(params, alive, camera, settings, gx, gy)
    oracle = render_oracle(
        **{k: sc[k] for k in (
            "xyz", "log_scaling", "rotation", "logit_opacity", "features",
            "world_view", "full_proj", "cam_center", "width", "height",
            "tan_fovx", "tan_fovy", "sh_degree")},
        bg=np.zeros(3),
        antialiasing=antialiasing,
    )

    visible = np.asarray(screen.mask)
    visible_oracle = oracle["radius"] > 0
    np.testing.assert_array_equal(visible, visible_oracle)
    assert visible.sum() > 50, "test scene should have many visible gaussians"

    np.testing.assert_allclose(
        np.asarray(screen.mean2d)[visible], oracle["mean2d"][visible],
        rtol=1e-4, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(screen.conic)[visible], oracle["conic"][visible],
        rtol=2e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(screen.depth)[visible], oracle["depth"][visible], rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(screen.radius)[visible], oracle["radius"][visible]
    )
    np.testing.assert_allclose(
        np.asarray(screen.rgb)[visible], oracle["rgb"][visible],
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(screen.opacity)[visible], oracle["opacity"][visible],
        rtol=1e-4, atol=1e-6,
    )
    # default (tight_cull) settings emit from the opacity-aware ellipse AABB:
    # rects must be CONTAINED in the reference rects (render/grad equivalence
    # of the dropped tiles is covered by test_tight_cull_exact)
    rects = np.concatenate(
        [np.asarray(screen.rect_min), np.asarray(screen.rect_max)], axis=-1
    )
    ref = oracle["rects"][visible]
    ours = rects[visible]
    nonempty = (ours[:, 2] > ours[:, 0]) & (ours[:, 3] > ours[:, 1])
    assert np.all(ours[nonempty][:, :2] >= ref[nonempty][:, :2])
    assert np.all(ours[nonempty][:, 2:] <= ref[nonempty][:, 2:])

    # reference-rect mode reproduces getRect exactly
    screen_ref = preprocess(
        params, alive, camera, settings.replace(tight_cull=False), gx, gy
    )
    rects_ref = np.concatenate(
        [np.asarray(screen_ref.rect_min), np.asarray(screen_ref.rect_max)], axis=-1
    )
    np.testing.assert_array_equal(rects_ref[visible], oracle["rects"][visible])


def test_binning_matches_oracle(rng):
    sc = make_test_scene(rng)
    params, camera, alive = scene_to_inputs(sc)
    # tight_cull=False: this test checks the exact rect-based instance
    # structure of the reference (`duplicateWithKeys`); the tight-cull
    # mode's render/grad equivalence is covered by test_tight_cull_exact
    settings = make_render_settings(sh_degree=sc["sh_degree"], tight_cull=False)
    gx, gy = grid_dims(camera, settings.tile)

    screen = preprocess(params, alive, camera, settings, gx, gy)
    bins = bin_gaussians(
        screen, gx, gy, settings.instance_capacity, settings.tile, tight_cull=False
    )
    oracle = render_oracle(
        **{k: sc[k] for k in (
            "xyz", "log_scaling", "rotation", "logit_opacity", "features",
            "world_view", "full_proj", "cam_center", "width", "height",
            "tan_fovx", "tan_fovy", "sh_degree")},
        bg=np.zeros(3),
    )

    assert int(bins.num_instances) == oracle["num_instances"]
    assert int(bins.overflow) == 0

    # Per-tile instance sets must match (ordering within equal depths is
    # implementation-defined but both sides are stable by gaussian index).
    start = np.asarray(bins.tile_start)
    end = np.asarray(bins.tile_end)
    gid = np.asarray(bins.gauss_id)
    # rebuild oracle per-tile lists
    import collections

    by_tile = collections.defaultdict(list)
    depth = oracle["depth"]
    rects = oracle["rects"]
    for i in range(len(depth)):
        if oracle["radius"][i] <= 0:
            continue
        x0, y0, x1, y1 = rects[i]
        for ty in range(y0, y1):
            for tx in range(x0, x1):
                by_tile[ty * gx + tx].append(i)
    for t in range(gx * gy):
        ours = list(gid[start[t] : end[t]])
        theirs = sorted(by_tile.get(t, []), key=lambda i: (depth[i], i))
        assert ours == theirs, f"tile {t} mismatch"


@pytest.mark.parametrize("bg_val", [0.0, 1.0])
def test_render_matches_oracle(rng, bg_val):
    sc = make_test_scene(rng)
    params, camera, alive = scene_to_inputs(sc)
    settings = make_render_settings(sh_degree=sc["sh_degree"], max_per_tile=512)
    bg = np.full(3, bg_val, np.float32)

    out = render(camera, params, alive, settings, bg)
    oracle = render_oracle(
        **{k: sc[k] for k in (
            "xyz", "log_scaling", "rotation", "logit_opacity", "features",
            "world_view", "full_proj", "cam_center", "width", "height",
            "tan_fovx", "tan_fovy", "sh_degree")},
        bg=bg,
    )

    assert int(out["tile_overflow"]) == 0
    np.testing.assert_allclose(
        np.asarray(out["render"]),
        np.clip(oracle["color"], 0.0, 1.0),
        rtol=1e-3,
        atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["invdepth"]), oracle["invdepth"], rtol=1e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["final_t"]), oracle["final_t"], rtol=1e-3, atol=1e-4
    )


def test_tight_cull_exact(rng):
    """Tight culling must change NOTHING: the dropped (gaussian, tile)
    instances have max alpha < 1/255 over their whole tile, which the
    per-pixel blend skips anyway (`forward.cu:366`). Renders, invdepth and
    every gradient must match the rect-binned path bitwise-close, while the
    instance lists genuinely shrink."""
    import jax

    sc = make_test_scene(rng, n=4000)
    params, camera, alive = scene_to_inputs(sc)
    gx, gy = grid_dims(camera, 16)

    outs = {}
    grads = {}
    counts = {}
    for cull in (False, True):
        settings = make_render_settings(
            sh_degree=sc["sh_degree"], max_per_tile=1024, tight_cull=cull
        )

        def loss(p):
            o = render(camera, p, alive, settings, jnp.zeros(3))
            return (o["render"].sum() + o["invdepth"].sum()), o

        (l, o), g = jax.value_and_grad(loss, has_aux=True)(params)
        outs[cull] = o
        grads[cull] = g
        screen = preprocess(params, alive, camera, settings, gx, gy)
        bins = bin_gaussians(
            screen, gx, gy, settings.instance_capacity, 16, tight_cull=cull
        )
        counts[cull] = int(np.sum(np.asarray(bins.tile_end - bins.tile_start)))

    assert counts[True] < counts[False], "tight cull should drop instances"
    np.testing.assert_allclose(
        np.asarray(outs[True]["render"]), np.asarray(outs[False]["render"]),
        rtol=0, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(outs[True]["invdepth"]), np.asarray(outs[False]["invdepth"]),
        rtol=0, atol=1e-6,
    )
    # gradients: identical up to f32 reassociation (dropping zero-weight
    # instances changes the summation order of the per-instance reduction)
    for f in ("xyz", "scaling", "rotation", "opacity", "features_dc", "features_rest"):
        np.testing.assert_allclose(
            np.asarray(getattr(grads[True], f)),
            np.asarray(getattr(grads[False], f)),
            rtol=1e-4, atol=1e-5, err_msg=f,
        )
