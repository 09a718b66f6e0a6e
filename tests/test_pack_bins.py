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


def _elongated_scene(seed, n):
    """Scene whose splats are strongly anisotropic (thin, arbitrarily
    rotated) — the regime where the conic-metric cull beats the circle."""
    rng = np.random.default_rng(seed)
    sc = make_test_scene(rng, n=n, width=160, height=112, sh_degree=1)
    s = np.exp(sc["log_scaling"])
    s[:, 0] *= rng.uniform(4.0, 30.0, n)  # stretch one axis hard
    s[:, 1] *= rng.uniform(0.05, 0.4, n)
    sc["log_scaling"] = np.log(s).astype(np.float32)
    params, camera, alive = scene_to_inputs(sc)
    settings = make_render_settings(sh_degree=1, instance_capacity=1 << 16)
    gx, gy = grid_dims(camera, 16)
    screen = preprocess(params, alive, camera, settings, gx, gy)
    return screen, gx, gy


@pytest.mark.parametrize("scene_kind", ["random", "elongated"])
def test_tight_cull_is_conservative(scene_kind):
    """Every instance the conic-metric cull drops must have alpha < 1/255 at
    EVERY pixel of its tile (brute-forced with the blend's exact alpha
    rule) — the invariant that makes culling invisible to renders and
    gradients."""
    from gsplat_tpu.ops.rasterize_jnp import ALPHA_MAX, ALPHA_MIN

    cap = 1 << 16
    if scene_kind == "random":
        screen, gx, gy = _scene(13, 3000, cap, True)
    else:
        screen, gx, gy = _elongated_scene(17, 1200)
    on = bin_gaussians(screen, gx, gy, cap, 16, tight_cull=True)
    off = bin_gaussians(screen, gx, gy, cap, 16, tight_cull=False)
    assert int(on.overflow) == 0 and int(off.overflow) == 0

    def inst_set(b):
        t = np.asarray(b.tile_id)
        g = np.asarray(b.gauss_id)
        live = t < gx * gy
        return set(zip(t[live].tolist(), g[live].tolist()))

    culled = inst_set(off) - inst_set(on)
    assert inst_set(on) <= inst_set(off)
    assert len(culled) > 0, "scene must exercise the cull"

    s = jax.tree.map(np.asarray, screen)
    px = np.arange(16)
    PX, PY = np.meshgrid(px, px)
    worst = 0.0
    for t, g in culled:
        tx, ty = t % gx, t // gx
        # float64 ground truth
        dx = (tx * 16 + PX).astype(np.float64) - s.mean2d[g, 0]
        dy = (ty * 16 + PY).astype(np.float64) - s.mean2d[g, 1]
        a, b_, c = s.conic[g]
        power = -0.5 * (a * dx * dx + c * dy * dy) - b_ * dx * dy
        alpha = np.minimum(s.opacity[g] * np.exp(power), ALPHA_MAX)
        contrib = (power <= 0.0) & (alpha >= ALPHA_MIN)
        worst = max(worst, float(alpha[power <= 0.0].max(initial=0.0)))
        assert not contrib.any(), (
            f"culled instance (tile {t}, gid {g}) has a contributing pixel "
            f"(max alpha {alpha.max()})"
        )
        # f32 in the BLEND KERNEL's exact association order (folded conic,
        # (ca*dx*dx + cc*dy*dy) + cb*dx*dy) — conservativeness must hold
        # against the alpha the kernel actually computes, not just the
        # real-arithmetic one
        f32 = np.float32
        dx32 = f32(f32(tx * 16) + PX.astype(f32)) - f32(s.mean2d[g, 0])
        dy32 = f32(f32(ty * 16) + PY.astype(f32)) - f32(s.mean2d[g, 1])
        ca, cb, cc = f32(-0.5) * f32(a), f32(-b_), f32(-0.5) * f32(c)
        p32 = (ca * dx32 * dx32 + cc * dy32 * dy32) + cb * dx32 * dy32
        al32 = np.minimum(f32(s.opacity[g]) * np.exp(p32), f32(ALPHA_MAX))
        assert not ((p32 <= 0.0) & (al32 >= f32(ALPHA_MIN))).any(), (
            f"culled instance (tile {t}, gid {g}) contributes under the "
            f"kernel's f32 rounding (max alpha {al32.max()})"
        )
    assert worst < ALPHA_MIN


@pytest.mark.parametrize("scene_kind", ["random", "elongated"])
def test_tight_cull_blend_equivalence(scene_kind):
    """Culling must not change renders or gradients beyond instance-order
    f32 rounding (removed instances shift lane positions in the scans)."""
    import gsplat_tpu.ops.rasterize_pallas as rp

    cap = 1 << 16
    if scene_kind == "random":
        screen, gx, gy = _scene(13, 3000, cap, True)
    else:
        screen, gx, gy = _elongated_scene(17, 1200)

    outs, grads = [], []
    for tc in (True, False):
        bins = pack_bins(screen, gx, gy, cap, 16, tight_cull=tc)
        out = rp.blend_tiles_pallas(screen, bins, gx, gy, 16)
        outs.append(out)

        def f(mean2d, opacity, bins=bins):
            o = rp.blend_tiles_pallas(
                screen.replace(mean2d=mean2d, opacity=opacity), bins, gx, gy, 16
            )
            return jnp.sum(o.color**2) + jnp.sum(o.final_t * 0.3)

        grads.append(jax.grad(f, (0, 1))(screen.mean2d, screen.opacity))

    np.testing.assert_allclose(
        np.asarray(outs[0].color), np.asarray(outs[1].color), atol=3e-6
    )
    np.testing.assert_allclose(
        np.asarray(outs[0].final_t), np.asarray(outs[1].final_t), atol=3e-6
    )
    for name, a, b in zip(["mean2d", "opacity"], grads[0], grads[1]):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-8)
        assert rel < 2e-5, f"{name}: rel diff {rel}"


def test_row_runs_cover_per_tile_test():
    """The run intervals (emission rule) must KEEP every tile the per-tile
    conic box-min test keeps — the runs are the same sublevel-set geometry
    solved per row, and an under-covering run would silently delete a
    visible instance (the one failure conservativeness forbids)."""
    from gsplat_tpu.ops.binning import (
        RUN_HMAX, _conic_box_qmin, compute_row_runs,
    )
    from gsplat_tpu.ops.projection import preprocess

    sc = make_test_scene(np.random.default_rng(23), n=1500, width=128,
                         height=96, sh_degree=1)
    params, camera, alive = scene_to_inputs(sc)
    settings = make_render_settings(sh_degree=1, max_per_tile=1024,
                                    instance_capacity=1 << 12)
    gx, gy = grid_dims(camera, 16)
    screen = preprocess(params, alive, camera, settings, gx, gy)
    t_lo, cum_run, trimmed, tiles_post = map(
        np.asarray, compute_row_runs(screen, 16, True)
    )
    rmin = np.asarray(screen.rect_min)
    rmax = np.asarray(screen.rect_max)
    conic = np.asarray(screen.conic)
    mean2d = np.asarray(screen.mean2d)
    qmax = np.asarray(screen.cull_qmax)
    live = np.asarray(screen.tiles_touched) > 0

    checked = 0
    for i in np.nonzero(live & trimmed)[0]:
        run_len = np.diff(np.append(cum_run[i], tiles_post[i]))
        for r in range(min(RUN_HMAX, rmax[i, 1] - rmin[i, 1])):
            ty = rmin[i, 1] + r
            for tx in range(rmin[i, 0], rmax[i, 0]):
                qmin = float(_conic_box_qmin(
                    mean2d[i, 0], mean2d[i, 1], conic[i, 0], conic[i, 1],
                    conic[i, 2], float(tx * 16), float(ty * 16), 16.0,
                ))
                if qmin <= qmax[i]:  # per-tile test keeps it
                    lo = t_lo[i, r]
                    assert lo <= tx < lo + run_len[r], (i, r, tx)
                    checked += 1
    assert checked > 200  # the cross-check actually exercised real tiles
