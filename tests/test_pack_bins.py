"""Fused binning+packing (`pack_bins`, Pallas expand kernel) vs the plain
`bin_gaussians` + gather reference path.

With zero overflow the two must agree BITWISE: same instance order
(tile, depth-bits, gid), same per-tile ranges, and packed attributes equal
to the per-gaussian values exactly (the expand kernel's one-hot matmul is an
exact selection; no run-length-decode drift is allowed).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu.core.types import make_render_settings
from gsplat_tpu.ops.binning import bin_gaussians, pack_bins
from gsplat_tpu.ops.projection import preprocess
from gsplat_tpu.render import grid_dims
from tests.oracle.reference_math import make_test_scene
from tests.test_forward_vs_oracle import scene_to_inputs


def _scene(seed, n, cap, tight_cull):
    sc = make_test_scene(
        np.random.default_rng(seed), n=n, width=160, height=112, sh_degree=2
    )
    params, camera, alive = scene_to_inputs(sc)
    settings = make_render_settings(sh_degree=2, instance_capacity=cap)
    gx, gy = grid_dims(camera, 16)
    screen = preprocess(params, alive, camera, settings, gx, gy)
    return screen, gx, gy


@pytest.mark.parametrize(
    "seed,n,tight_cull", [(3, 1500, True), (7, 1500, False), (11, 3000, True)]
)
def test_pack_bins_matches_bin_gaussians(seed, n, tight_cull):
    cap = 1 << 15
    screen, gx, gy = _scene(seed, n, cap, tight_cull)
    bins = bin_gaussians(screen, gx, gy, cap, 16, tight_cull=tight_cull)
    pb = jax.jit(
        lambda s: pack_bins(s, gx, gy, cap, 16, tight_cull=tight_cull)
    )(screen)

    assert int(pb.overflow) == 0 and int(bins.overflow) == 0
    assert int(pb.num_instances) == int(bins.num_instances)
    np.testing.assert_array_equal(np.asarray(pb.tile_start), np.asarray(bins.tile_start))
    np.testing.assert_array_equal(np.asarray(pb.tile_end), np.asarray(bins.tile_end))

    k = bins.gauss_id.shape[0]
    valid = np.asarray(bins.tile_id) < gx * gy
    np.testing.assert_array_equal(
        np.asarray(pb.tile_id)[:k][valid], np.asarray(bins.tile_id)[valid]
    )
    np.testing.assert_array_equal(
        np.asarray(pb.gauss_id)[:k][valid], np.asarray(bins.gauss_id)[valid]
    )

    # packed attributes == per-gaussian values, bitwise (conic rides
    # pre-folded as [-a/2, -b, -c/2] — exact scalings, see pack_bins)
    gid = np.asarray(bins.gauss_id)
    table = np.stack(
        [
            np.asarray(screen.mean2d[:, 0]), np.asarray(screen.mean2d[:, 1]),
            -0.5 * np.asarray(screen.conic[:, 0]),
            -np.asarray(screen.conic[:, 1]),
            -0.5 * np.asarray(screen.conic[:, 2]), np.asarray(screen.opacity),
            np.asarray(screen.rgb[:, 0]), np.asarray(screen.rgb[:, 1]),
            np.asarray(screen.rgb[:, 2]),
            np.asarray(1.0 / np.maximum(np.asarray(screen.depth), 0.2)),
        ],
        axis=0,
    )
    inst = np.asarray(pb.inst_t)[:10, :k]
    for r in range(10):
        np.testing.assert_array_equal(
            inst[r][valid], table[r][gid][valid], err_msg=f"attr row {r}"
        )


def test_pack_bins_empty_scene():
    screen, gx, gy = _scene(1, 64, 1 << 10, True)
    screen = screen.replace(
        tiles_touched=jnp.zeros_like(screen.tiles_touched),
        mask=jnp.zeros_like(screen.mask),
    )
    pb = pack_bins(screen, gx, gy, 1 << 10, 16)
    assert int(pb.num_instances) == 0
    assert int((pb.tile_end - pb.tile_start).sum()) == 0
    assert np.all(np.asarray(pb.tile_id) == gx * gy)


def test_pack_bins_overflow_reported():
    # capacity far below the emitted count: overflow must be reported and
    # the structure must stay internally consistent (ranges cover <= cap)
    screen, gx, gy = _scene(11, 3000, 1 << 12, True)
    pb = pack_bins(screen, gx, gy, 1 << 12, 16)
    assert int(pb.overflow) > 0
    cap = pb.gauss_id.shape[0]
    assert int(pb.tile_end[-1]) <= cap
    ends = np.asarray(pb.tile_end)
    starts = np.asarray(pb.tile_start)
    assert np.all(ends >= starts)
    assert np.all(starts[1:] == ends[:-1])
