"""Pallas blend kernels (interpret mode) vs the differentiable jnp oracle.

Ladder-of-fidelity: reference_math (numpy scalar) -> rasterize_jnp (jit) ->
rasterize_pallas (Mosaic). On CPU the kernels run in the Pallas interpreter;
the same comparisons are run on real TPU by the driver/bench path.
"""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import gsplat_tpu.ops.rasterize_pallas as rp
from gsplat_tpu.core.types import make_render_settings
from gsplat_tpu.ops.binning import bin_gaussians, pack_bins
from gsplat_tpu.ops.projection import preprocess
from gsplat_tpu.ops.rasterize_jnp import blend_tiles_jnp
from gsplat_tpu.render import grid_dims
from tests.oracle.reference_math import make_test_scene
from tests.test_forward_vs_oracle import scene_to_inputs


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    shim = types.SimpleNamespace(
        **{k: getattr(pl, k) for k in dir(pl) if not k.startswith("_")}
    )
    shim.pallas_call = patched
    monkeypatch.setattr(rp, "pl", shim)


def build(n=600, width=96, height=80, sh_degree=1, seed=3):
    sc = make_test_scene(
        np.random.default_rng(seed), n=n, width=width, height=height, sh_degree=sh_degree
    )
    params, camera, alive = scene_to_inputs(sc)
    settings = make_render_settings(
        sh_degree=sh_degree, max_per_tile=1024, instance_capacity=1 << 14
    )
    gx, gy = grid_dims(camera, 16)
    screen = preprocess(params, alive, camera, settings, gx, gy)
    # production path: fused binning+packing (attributes ride the sort)
    bins = pack_bins(screen, gx, gy, settings.instance_capacity)
    return screen, bins, gx, gy


def test_forward_matches_jnp():
    screen, bins, gx, gy = build()
    oj_bins = bin_gaussians(screen, gx, gy, bins.gauss_id.shape[0])
    oj = blend_tiles_jnp(screen, oj_bins, gx, gy, 16, 1024, 128)
    op = rp.blend_tiles_pallas(screen, bins, gx, gy, 16, track_contrib=True)
    np.testing.assert_allclose(np.asarray(op.color), np.asarray(oj.color), atol=2e-5)
    np.testing.assert_allclose(np.asarray(op.invdepth), np.asarray(oj.invdepth), atol=2e-5)
    np.testing.assert_allclose(np.asarray(op.final_t), np.asarray(oj.final_t), atol=2e-5)
    # last-contributor parity (forward.cu:347-384; opt-in tracking)
    np.testing.assert_array_equal(np.asarray(op.n_contrib), np.asarray(oj.n_contrib))


def test_backward_matches_jnp_autodiff():
    screen, bins, gx, gy = build()
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.random((gx * gy, 256, 3)), jnp.float32)
    wd = jnp.asarray(rng.random((gx * gy, 256)), jnp.float32)

    def loss(fn):
        def f(mean2d, conic, opacity, rgb, depth):
            s2 = screen.replace(
                mean2d=mean2d, conic=conic, opacity=opacity, rgb=rgb, depth=depth
            )
            out = fn(s2)
            return (
                jnp.sum((out.color - tgt) ** 2)
                + jnp.sum(out.invdepth * wd)
                + jnp.sum(out.final_t * 0.3)
            )

        return f

    args = (screen.mean2d, screen.conic, screen.opacity, screen.rgb, screen.depth)
    gj = jax.grad(
        loss(lambda s: blend_tiles_jnp(s, bins, gx, gy, 16, 1024, 128)),
        argnums=(0, 1, 2, 3, 4),
    )(*args)
    gp = jax.grad(
        loss(lambda s: rp.blend_tiles_pallas(s, bins, gx, gy, 16)),
        argnums=(0, 1, 2, 3, 4),
    )(*args)
    for name, a, b in zip(["mean2d", "conic", "opacity", "rgb", "depth"], gj, gp):
        scale = float(jnp.abs(a).max()) + 1e-8
        rel = float(jnp.abs(a - b).max()) / scale
        assert rel < 5e-5, f"{name}: rel diff {rel}"


@pytest.mark.parametrize("unroll", [2, 4])
def test_unroll_bitwise_matches_baseline(unroll):
    """The gaussian-axis chunk unroll (FWD_UNROLL/BWD_UNROLL) is a pure
    issue-overhead optimization: forward outputs AND the per-instance
    gradient stream must be BIT-equal to the unroll=1 kernels (same math,
    same association order; the absent-mate masked re-blend contributes
    exactly nothing)."""
    screen, bins, gx, gy = build()
    f1 = rp._run_forward(bins.inst_t, bins.tile_start, bins.tile_end,
                         gx, gy, 16, True, 1, unroll=1)
    fu = rp._run_forward(bins.inst_t, bins.tile_start, bins.tile_end,
                         gx, gy, 16, True, 1, unroll=unroll)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(fu))
    rng = np.random.default_rng(5)
    dout = jnp.asarray(rng.normal(0, 1, f1.shape).astype(np.float32))
    valid = np.asarray(bins.tile_id < gx * gy)
    b1 = np.asarray(rp._run_backward(bins.inst_t, bins.tile_start, bins.tile_end,
                                     f1, dout, gx, gy, 16, 1, unroll=1))
    bu = np.asarray(rp._run_backward(bins.inst_t, bins.tile_start, bins.tile_end,
                                     f1, dout, gx, gy, 16, 1, unroll=unroll))
    # only slots inside the instance stream are ever written (the tail is
    # masked by slot_valid in blend_bwd before the gradient reduce)
    np.testing.assert_array_equal(b1[:, valid], bu[:, valid])


def test_empty_tiles_are_background():
    # all gaussians culled -> kernel loop never runs, output must be clean
    screen, bins, gx, gy = build(n=16)
    screen = screen.replace(
        tiles_touched=jnp.zeros_like(screen.tiles_touched),
        mask=jnp.zeros_like(screen.mask),
    )
    bins = pack_bins(screen, gx, gy, 1 << 10)
    op = rp.blend_tiles_pallas(screen, bins, gx, gy, 16)
    assert np.all(np.asarray(op.color) == 0)
    assert np.all(np.asarray(op.final_t) == 1.0)
    assert np.all(np.asarray(op.n_contrib) == 0)


def test_bf16_packets_close_to_f32():
    """bf16 instance packets (GS-IRON bfloat ladder analogue) stay within
    the reference's own bf16 acceptance tolerances (abs 0.05, test.cpp:88)."""
    import jax.numpy as jnp

    screen, bins, gx, gy = build()
    f32 = rp.blend_tiles_pallas(screen, bins, gx, gy, 16)
    bins_bf = pack_bins(
        screen, gx, gy, bins.gauss_id.shape[0], packet_dtype=jnp.bfloat16
    )
    bf16 = rp.blend_tiles_pallas(screen, bins_bf, gx, gy, 16)
    d = np.abs(np.asarray(f32.color) - np.asarray(bf16.color))
    # bf16's 8-bit mantissa costs ~0.5px of center precision at this image
    # width; color error lands at the same magnitude as the reference's own
    # bf16 kernels (abs tol 0.05-0.5, test.cpp:88,233-238)
    assert d.max() < 0.1, d.max()
    assert np.mean(d) < 5e-3, np.mean(d)
    assert np.isfinite(np.asarray(bf16.color)).all()


def test_hybrid_packets_positions_exact_values_close():
    """Hybrid packet mode: the position rows must be BIT-EQUAL to the f32
    path (bf16 positions are whole pixels at real image scale — the failed
    all-bf16 lego certification, artifacts/cert_r4), the value rows within
    bf16 rounding, the blend and its gradients close, and the packed
    gradient reduce within bf16 tolerance of the f32 reduce."""
    import jax
    import jax.numpy as jnp

    screen, bins, gx, gy = build()
    cap = bins.gauss_id.shape[0]
    bins_h = pack_bins(screen, gx, gy, cap, packet_dtype="hybrid")
    # identical sort keys -> identical permutation -> identical structure
    np.testing.assert_array_equal(np.asarray(bins.tile_id), np.asarray(bins_h.tile_id))
    np.testing.assert_array_equal(np.asarray(bins.gauss_id), np.asarray(bins_h.gauss_id))
    a = np.asarray(bins.inst_t)
    b = np.asarray(bins_h.inst_t)
    assert b.dtype == np.float32
    np.testing.assert_array_equal(a[0], b[0])  # mx bit-equal
    np.testing.assert_array_equal(a[1], b[1])  # my bit-equal
    # invz is recomputed from the sorted depth-bits key, never bf16-routed
    # — the inverse-depth image / depth-L1 gradients see zero rounding
    np.testing.assert_array_equal(a[9], b[9])  # invz bit-equal
    for r in range(2, 9):
        scale = np.abs(a[r]).max() + 1e-12
        assert np.abs(a[r] - b[r]).max() / scale < 2 ** -8, r

    def loss(inst_bins, pack):
        out = rp.blend_tiles_pallas(
            screen, inst_bins, gx, gy, 16, reduce_pack=pack
        )
        return (out.color ** 2).sum() + 0.3 * (out.invdepth ** 2).sum()

    f_f32 = loss(bins, False)
    f_hyb = loss(bins_h, True)
    assert abs(float(f_f32) - float(f_hyb)) / abs(float(f_f32)) < 1e-2

    def full(p_bins, pack):
        def fn(mean2d):
            s2 = screen.replace(mean2d=mean2d)
            out = rp.blend_tiles_pallas(s2, p_bins, gx, gy, 16, reduce_pack=pack)
            return (out.color ** 2).sum()
        return jax.grad(fn)(screen.mean2d)

    gf = np.asarray(full(bins, False))
    gh = np.asarray(full(bins_h, True))
    scale = np.abs(gf).max() + 1e-12
    assert np.abs(gf - gh).max() / scale < 3e-2


def test_streaming_protocol_boundary_patterns():
    """Adversarial tile-range shapes for the cross-invocation DMA protocol:
    empty head/mid/tail tiles, a range ending exactly on a chunk boundary,
    chunks shared by adjacent tiles, a single-instance tile, and a tail of
    unused capacity. Forward AND backward must match the jnp oracle."""
    from gsplat_tpu.ops.binning import TileBins

    n, width, height = 400, 64, 32  # 4x2 tile grid
    sc = make_test_scene(
        np.random.default_rng(11), n=n, width=width, height=height, sh_degree=1
    )
    params, camera, alive = scene_to_inputs(sc)
    settings = make_render_settings(
        sh_degree=1, max_per_tile=1024, instance_capacity=1 << 10
    )
    gx, gy = grid_dims(camera, 16)
    assert (gx, gy) == (4, 2)
    screen = preprocess(params, alive, camera, settings, gx, gy)

    cap = 1 << 10
    rng = np.random.default_rng(7)
    start = np.array([0, 0, 100, 256, 257, 900, 900, 1000], np.int32)
    end = np.array([0, 100, 256, 257, 900, 900, 1000, 1000], np.int32)
    gid = rng.integers(0, n, size=cap).astype(np.int32)
    tile_id = np.full(cap, gx * gy, np.int32)  # tail-invalid by default
    for t in range(8):
        tile_id[start[t] : end[t]] = t
    bins = TileBins(
        gauss_id=jnp.asarray(gid),
        tile_id=jnp.asarray(tile_id),
        tile_start=jnp.asarray(start),
        tile_end=jnp.asarray(end),
        num_instances=jnp.int32(1000),
        overflow=jnp.int32(0),
    )

    oj = blend_tiles_jnp(screen, bins, gx, gy, 16, 1024, 128)
    op = rp.blend_tiles_pallas(screen, bins, gx, gy, 16)
    np.testing.assert_allclose(np.asarray(op.color), np.asarray(oj.color), atol=2e-5)
    np.testing.assert_allclose(np.asarray(op.final_t), np.asarray(oj.final_t), atol=2e-5)

    def loss(fn):
        def f(mean2d, opacity):
            s2 = screen.replace(mean2d=mean2d, opacity=opacity)
            out = fn(s2)
            return jnp.sum(out.color**2) + jnp.sum(out.final_t * 0.3)

        return f

    args = (screen.mean2d, screen.opacity)
    gj = jax.grad(loss(lambda s: blend_tiles_jnp(s, bins, gx, gy, 16, 1024, 128)), (0, 1))(*args)
    gp = jax.grad(loss(lambda s: rp.blend_tiles_pallas(s, bins, gx, gy, 16)), (0, 1))(*args)
    for name, a, b in zip(["mean2d", "opacity"], gj, gp):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-8)
        assert rel < 5e-5, f"{name}: rel diff {rel}"


def test_saturation_early_out_is_exact():
    """Opaque gaussians saturate every pixel within a few instances; the
    kernels must skip the remaining chunks (stream jump) with renders AND
    gradients exactly matching the no-early-out jnp oracle. Interleaves
    saturating tiles (multi-chunk skips) with transparent tiles (no skip) so
    the jump/no-jump protocol transitions are all exercised."""
    from gsplat_tpu.ops.binning import TileBins

    n, width, height = 400, 64, 32  # 4x2 tile grid
    sc = make_test_scene(
        np.random.default_rng(23), n=n, width=width, height=height, sh_degree=1
    )
    params, camera, alive = scene_to_inputs(sc)
    settings = make_render_settings(
        sh_degree=1, max_per_tile=2048, instance_capacity=1 << 12
    )
    gx, gy = grid_dims(camera, 16)
    screen = preprocess(params, alive, camera, settings, gx, gy)
    # huge, near-opaque splats: every instance covers its whole tile and
    # multiplies transmittance by <= 0.1 -> saturation after ~4 instances
    opaque = screen.replace(
        opacity=jnp.full_like(screen.opacity, 0.9),
        conic=jnp.tile(jnp.asarray([1e-4, 0.0, 1e-4]), (screen.conic.shape[0], 1)),
    )

    cap = 1 << 12
    rng = np.random.default_rng(5)
    # tiles 0,2,4,6: 500-instance ranges (4 chunks; >=2 skipped when opaque)
    # tiles 1,5: empty; tiles 3,7: short ranges crossing chunk boundaries
    start = np.array([0, 500, 500, 1000, 1100, 1600, 1600, 2100], np.int32)
    end = np.array([500, 500, 1000, 1100, 1600, 1600, 2100, 2180], np.int32)
    gid = rng.integers(0, n, size=cap).astype(np.int32)
    tile_id = np.full(cap, gx * gy, np.int32)
    for t in range(8):
        tile_id[start[t] : end[t]] = t
    bins = TileBins(
        gauss_id=jnp.asarray(gid),
        tile_id=jnp.asarray(tile_id),
        tile_start=jnp.asarray(start),
        tile_end=jnp.asarray(end),
        num_instances=jnp.int32(2180),
        overflow=jnp.int32(0),
    )

    for label, scr in [("opaque", opaque), ("mixed", screen)]:
        oj = blend_tiles_jnp(scr, bins, gx, gy, 16, 2048, 128)
        op = rp.blend_tiles_pallas(scr, bins, gx, gy, 16)
        np.testing.assert_allclose(
            np.asarray(op.color), np.asarray(oj.color), atol=2e-5, err_msg=label
        )
        np.testing.assert_allclose(
            np.asarray(op.final_t), np.asarray(oj.final_t), atol=2e-5, err_msg=label
        )

        def loss(fn):
            def f(mean2d, opacity, rgb):
                s2 = scr.replace(mean2d=mean2d, opacity=opacity, rgb=rgb)
                out = fn(s2)
                return jnp.sum(out.color**2) + jnp.sum(out.final_t * 0.3)

            return f

        args = (scr.mean2d, scr.opacity, scr.rgb)
        gj = jax.grad(
            loss(lambda s: blend_tiles_jnp(s, bins, gx, gy, 16, 2048, 128)),
            (0, 1, 2),
        )(*args)
        gp = jax.grad(
            loss(lambda s: rp.blend_tiles_pallas(s, bins, gx, gy, 16)), (0, 1, 2)
        )(*args)
        for name, a, b in zip(["mean2d", "opacity", "rgb"], gj, gp):
            rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-8)
            assert rel < 5e-5, f"{label}/{name}: rel diff {rel}"


@pytest.mark.parametrize("dims", [(96, 80), (80, 80)])  # 30 tiles / 25 (odd -> padded pair)
def test_tile_pairing_matches_unpaired(dims):
    """tiles_per_step=2 is a pure execution-shape change (two adjacent tiles
    share the chunk loop on 512 sublanes, one gradient emit per union chunk):
    forward outputs and gradients must match the unpaired kernels."""
    w, h = dims
    screen, bins, gx, gy = build(width=w, height=h)
    o1 = rp.blend_tiles_pallas(screen, bins, gx, gy, 16, track_contrib=True)
    o2 = rp.blend_tiles_pallas(
        screen, bins, gx, gy, 16, track_contrib=True, tiles_per_step=2
    )
    np.testing.assert_allclose(np.asarray(o2.color), np.asarray(o1.color), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(o2.invdepth), np.asarray(o1.invdepth), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(o2.final_t), np.asarray(o1.final_t), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(o2.n_contrib), np.asarray(o1.n_contrib))

    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.random((gx * gy, 256, 3)), jnp.float32)

    def loss(pair):
        def f(mean2d, conic, opacity, rgb, depth):
            s2 = screen.replace(
                mean2d=mean2d, conic=conic, opacity=opacity, rgb=rgb, depth=depth
            )
            out = rp.blend_tiles_pallas(s2, bins, gx, gy, 16, tiles_per_step=pair)
            return jnp.sum((out.color - tgt) ** 2) + jnp.sum(out.final_t * 0.3)

        return f

    args = (screen.mean2d, screen.conic, screen.opacity, screen.rgb, screen.depth)
    g1 = jax.grad(loss(1), argnums=(0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(loss(2), argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(["mean2d", "conic", "opacity", "rgb", "depth"], g1, g2):
        scale = float(jnp.abs(a).max()) + 1e-8
        rel = float(jnp.abs(a - b).max()) / scale
        assert rel < 1e-5, f"{name}: rel diff {rel}"


def test_tile_pairing_boundary_patterns():
    """The adversarial range shapes of the streaming-protocol test, run
    through the PAIRED kernels: empty tiles inside a pair, ranges ending on
    chunk boundaries, a boundary chunk shared across a PAIR boundary (the
    carry/hold protocol now at pair granularity), and unused tail capacity."""
    from gsplat_tpu.ops.binning import TileBins

    n, width, height = 400, 64, 32  # 4x2 tile grid -> 4 pairs
    sc = make_test_scene(
        np.random.default_rng(11), n=n, width=width, height=height, sh_degree=1
    )
    params, camera, alive = scene_to_inputs(sc)
    settings = make_render_settings(
        sh_degree=1, max_per_tile=1024, instance_capacity=1 << 10
    )
    gx, gy = grid_dims(camera, 16)
    screen = preprocess(params, alive, camera, settings, gx, gy)

    cap = 1 << 10
    rng = np.random.default_rng(7)
    start = np.array([0, 0, 100, 256, 257, 900, 900, 1000], np.int32)
    end = np.array([0, 100, 256, 257, 900, 900, 1000, 1000], np.int32)
    gid = rng.integers(0, n, size=cap).astype(np.int32)
    tile_id = np.full(cap, gx * gy, np.int32)
    for t in range(8):
        tile_id[start[t] : end[t]] = t
    bins = TileBins(
        gauss_id=jnp.asarray(gid),
        tile_id=jnp.asarray(tile_id),
        tile_start=jnp.asarray(start),
        tile_end=jnp.asarray(end),
        num_instances=jnp.int32(1000),
        overflow=jnp.int32(0),
    )

    o1 = rp.blend_tiles_pallas(screen, bins, gx, gy, 16)
    o2 = rp.blend_tiles_pallas(screen, bins, gx, gy, 16, tiles_per_step=2)
    np.testing.assert_allclose(np.asarray(o2.color), np.asarray(o1.color), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(o2.final_t), np.asarray(o1.final_t), atol=1e-6
    )

    def loss(pair):
        def f(mean2d, opacity):
            s2 = screen.replace(mean2d=mean2d, opacity=opacity)
            out = rp.blend_tiles_pallas(s2, bins, gx, gy, 16, tiles_per_step=pair)
            return jnp.sum(out.color**2) + jnp.sum(out.final_t * 0.3)

        return f

    args = (screen.mean2d, screen.opacity)
    g1 = jax.grad(loss(1), (0, 1))(*args)
    g2 = jax.grad(loss(2), (0, 1))(*args)
    for name, a, b in zip(["mean2d", "opacity"], g1, g2):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-8)
        assert rel < 1e-5, f"{name}: rel diff {rel}"


def test_tile_pairing_oit_matches_unpaired():
    """OIT pairing: per-tile W rows summed over the pair, block-diagonal
    moments — outputs and gradients must match the unpaired OIT kernels."""
    screen, bins, gx, gy = build(width=80, height=80)  # 25 tiles (odd)
    o1 = rp.blend_tiles_pallas(screen, bins, gx, gy, 16, blend_mode="oit")
    o2 = rp.blend_tiles_pallas(
        screen, bins, gx, gy, 16, blend_mode="oit", tiles_per_step=2
    )
    np.testing.assert_allclose(np.asarray(o2.color), np.asarray(o1.color), atol=1e-6)
    np.testing.assert_allclose(np.asarray(o2.final_t), np.asarray(o1.final_t), atol=1e-6)

    def loss(pair):
        def f(mean2d, opacity, rgb, depth):
            s2 = screen.replace(mean2d=mean2d, opacity=opacity, rgb=rgb, depth=depth)
            out = rp.blend_tiles_pallas(
                s2, bins, gx, gy, 16, blend_mode="oit", tiles_per_step=pair
            )
            return (
                jnp.sum(out.color**2)
                + jnp.sum(out.final_t * 0.3)
                + jnp.sum(out.invdepth * 0.1)
            )

        return f

    args = (screen.mean2d, screen.opacity, screen.rgb, screen.depth)
    g1 = jax.grad(loss(1), (0, 1, 2, 3))(*args)
    g2 = jax.grad(loss(2), (0, 1, 2, 3))(*args)
    for name, a, b in zip(["mean2d", "opacity", "rgb", "depth"], g1, g2):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-8)
        assert rel < 2e-5, f"{name}: rel diff {rel}"


def test_backward_large_splats_far_centers():
    """Moment-recombination robustness for huge splats (advisor round-2 low):
    the backward reconstructs conic/mean gradients from tile-local moments as
    mxl^2*m0-style terms; a gaussian whose center sits hundreds of pixels
    from the tile amplifies f32 rounding by ~eps*mxl^2. Build a scene whose
    splats have radii of hundreds of pixels (centers far outside most tiles
    they touch) and hold the pallas gradients to the jnp-autodiff oracle."""
    sc = make_test_scene(np.random.default_rng(9), n=48, width=512, height=256)
    # inflate the scales so each splat covers a large fraction of the image:
    # radii land at ~150-400 px, centers up to ~400 px from covered tiles
    sc["log_scaling"] = np.log(
        np.random.default_rng(10).uniform(0.6, 1.8, sc["log_scaling"].shape)
    ).astype(np.float32)
    params, camera, alive = scene_to_inputs(sc)
    settings = make_render_settings(
        sh_degree=2, max_per_tile=4096, instance_capacity=1 << 16
    )
    gx, gy = grid_dims(camera, 16)
    screen = preprocess(params, alive, camera, settings, gx, gy)
    assert int(jnp.max(screen.radius)) > 150, "scene must contain huge splats"
    bins = pack_bins(screen, gx, gy, settings.instance_capacity)
    assert int(bins.overflow) == 0

    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.random((gx * gy, 256, 3)), jnp.float32)

    def loss(fn):
        def f(mean2d, conic, opacity, rgb):
            s2 = screen.replace(mean2d=mean2d, conic=conic, opacity=opacity, rgb=rgb)
            out = fn(s2)
            return jnp.sum((out.color - tgt) ** 2) + jnp.sum(out.final_t * 0.3)

        return f

    oj_bins = bin_gaussians(screen, gx, gy, settings.instance_capacity)
    args = (screen.mean2d, screen.conic, screen.opacity, screen.rgb)
    gj = jax.grad(
        loss(lambda s: blend_tiles_jnp(s, oj_bins, gx, gy, 16, 4096, 128)),
        argnums=(0, 1, 2, 3),
    )(*args)
    gp = jax.grad(
        loss(lambda s: rp.blend_tiles_pallas(s, bins, gx, gy, 16)),
        argnums=(0, 1, 2, 3),
    )(*args)
    for name, a, b in zip(["mean2d", "conic", "opacity", "rgb"], gj, gp):
        scale = float(jnp.abs(a).max()) + 1e-8
        rel = float(jnp.abs(a - b).max()) / scale
        assert rel < 2e-4, f"{name}: rel diff {rel}"


def test_oit_forward_matches_jnp():
    """OIT pallas kernels vs the jnp OIT oracle (commutative sums)."""
    from gsplat_tpu.ops.rasterize_jnp import blend_tiles_oit_jnp

    screen, bins, gx, gy = build()
    oj_bins = bin_gaussians(screen, gx, gy, bins.gauss_id.shape[0])
    oj = blend_tiles_oit_jnp(screen, oj_bins, gx, gy, 16, 1024, 128)
    op = rp.blend_tiles_pallas(screen, bins, gx, gy, 16, blend_mode="oit")
    np.testing.assert_allclose(np.asarray(op.color), np.asarray(oj.color), atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(op.invdepth), np.asarray(oj.invdepth), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(op.final_t), np.asarray(oj.final_t), atol=3e-5
    )
    # total transmittance is exact (order-free product over ALL kept alphas)
    assert np.isfinite(np.asarray(op.color)).all()


def test_oit_backward_matches_jnp_autodiff():
    """OIT gradients: manual per-instance-local VJP (incl. the invz chain
    through the depth weight alpha*invz^2) vs jnp autodiff of the oracle."""
    from gsplat_tpu.ops.rasterize_jnp import blend_tiles_oit_jnp

    screen, bins, gx, gy = build()
    rng = np.random.default_rng(0)
    tgt = jnp.asarray(rng.random((gx * gy, 256, 3)), jnp.float32)
    wd = jnp.asarray(rng.random((gx * gy, 256)), jnp.float32)

    def loss(fn):
        def f(mean2d, conic, opacity, rgb, depth):
            s2 = screen.replace(
                mean2d=mean2d, conic=conic, opacity=opacity, rgb=rgb, depth=depth
            )
            out = fn(s2)
            return (
                jnp.sum((out.color - tgt) ** 2)
                + jnp.sum(out.invdepth * wd)
                + jnp.sum(out.final_t * 0.3)
            )

        return f

    args = (screen.mean2d, screen.conic, screen.opacity, screen.rgb, screen.depth)
    gj = jax.grad(
        loss(lambda s: blend_tiles_oit_jnp(
            s, bin_gaussians(s, gx, gy, bins.gauss_id.shape[0]), gx, gy, 16, 1024, 128
        )),
        argnums=(0, 1, 2, 3, 4),
    )(*args)
    gp = jax.grad(
        loss(lambda s: rp.blend_tiles_pallas(s, bins, gx, gy, 16, blend_mode="oit")),
        argnums=(0, 1, 2, 3, 4),
    )(*args)
    for name, a, b in zip(["mean2d", "conic", "opacity", "rgb", "depth"], gj, gp):
        scale = float(jnp.abs(a).max()) + 1e-8
        rel = float(jnp.abs(a - b).max()) / scale
        assert rel < 5e-5, f"{name}: rel diff {rel}"


def test_oit_empty_and_nonoverlapping_match_sorted():
    """Where splats don't overlap per pixel, OIT == sorted blending (the
    occlusion order is irrelevant); empty tiles stay pure background."""
    screen, bins, gx, gy = build(n=24, width=96, height=80, seed=12)
    # shrink everything to tiny non-overlapping splats: keep only gaussians
    # whose pixel rects don't intersect, by spreading means on a grid
    n = screen.mean2d.shape[0]
    gxs = (np.arange(n) % 6) * 16.0 + 8.0
    gys = (np.arange(n) // 6) * 16.0 + 8.0
    screen = screen.replace(
        mean2d=jnp.asarray(np.stack([gxs, gys], -1), jnp.float32),
        conic=jnp.broadcast_to(jnp.asarray([2.0, 0.0, 2.0]), (n, 3)),
    )
    from gsplat_tpu.ops.projection import preprocess  # noqa: F401 (rect rebuild)

    # rebuild rects for the moved splats via re-binning on a fresh pack
    from gsplat_tpu.ops.binning import pack_bins as pb

    r = 8
    rect_min = jnp.stack(
        [(screen.mean2d[:, 0] - r) // 16, (screen.mean2d[:, 1] - r) // 16], -1
    ).astype(jnp.int32)
    rect_max = jnp.stack(
        [(screen.mean2d[:, 0] + r) // 16 + 1, (screen.mean2d[:, 1] + r) // 16 + 1], -1
    ).astype(jnp.int32)
    rect_min = jnp.clip(rect_min, 0, jnp.asarray([gx, gy]) - 1)
    rect_max = jnp.clip(rect_max, 1, jnp.asarray([gx, gy]))
    tiles = (rect_max[:, 0] - rect_min[:, 0]) * (rect_max[:, 1] - rect_min[:, 1])
    screen = screen.replace(
        rect_min=rect_min, rect_max=rect_max,
        tiles_touched=tiles, mask=jnp.ones((n,), bool),
        cull_qmax=jnp.full((n,), 1e9, jnp.float32),
    )
    bins2 = pb(screen, gx, gy, 1 << 12)
    sorted_out = rp.blend_tiles_pallas(screen, bins2, gx, gy, 16)
    oit_out = rp.blend_tiles_pallas(screen, bins2, gx, gy, 16, blend_mode="oit")
    np.testing.assert_allclose(
        np.asarray(oit_out.color), np.asarray(sorted_out.color), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(oit_out.final_t), np.asarray(sorted_out.final_t), atol=5e-5
    )
