"""Multi-chip paths on the 8-device virtual CPU mesh.

- explicit shard_map pipeline (parallel/pipeline.py) must be bit-exact vs
  the single-device render, forward and backward
- the auto-sharded train step (parallel/sharding.py) must compile + run
  (exercised again by the driver via __graft_entry__.dryrun_multichip)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu.core.types import make_render_settings
from gsplat_tpu.parallel.pipeline import make_sharded_render
from gsplat_tpu.parallel.sharding import make_mesh, shard_params
from gsplat_tpu.render import render
from tests.oracle.reference_math import make_test_scene
from tests.test_forward_vs_oracle import scene_to_inputs

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def setup():
    sc = make_test_scene(
        np.random.default_rng(5), n=2048, width=128, height=128, sh_degree=2
    )
    params, camera, alive = scene_to_inputs(sc)
    settings = make_render_settings(
        sh_degree=2, max_per_tile=512, instance_capacity=1 << 16, backend="jnp"
    )
    return params, camera, alive, settings


@pytest.mark.parametrize(
    "mesh_shape,backend",
    [
        ((4, 2), "jnp"), ((2, 4), "jnp"), ((8, 1), "jnp"), ((1, 8), "jnp"),
        # the flagship kernels under the mesh (Pallas interpreter on CPU):
        # the fused binning + blend kernels run per tile-band inside shard_map
        ((4, 2), "pallas"), ((1, 8), "pallas"),
    ],
)
def test_sharded_render_matches_single_device(setup, mesh_shape, backend):
    params, camera, alive, settings = setup
    settings = settings.replace(backend=backend)
    ref = jax.jit(lambda p, a: render(camera, p, a, settings, jnp.zeros(3)))(
        params, alive
    )
    mesh = make_mesh(n_gauss=mesh_shape[0], n_tile=mesh_shape[1])
    sp, sa = shard_params(params, alive, mesh)
    sr = make_sharded_render(mesh, settings, 128, 128)
    out = jax.jit(sr)(camera, sp, sa, jnp.zeros(3))
    assert int(out["instance_overflow"]) == 0
    np.testing.assert_allclose(
        np.asarray(out["render"]), np.asarray(ref["render"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["invdepth"]), np.asarray(ref["invdepth"]), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(out["radii"]), np.asarray(ref["radii"]))


def test_sharded_pallas_gradients_match(setup):
    """Backward through the Pallas kernels inside shard_map: the custom-VJP
    blend + segment reduction run per shard, and the all_gather transposes
    into the psum_scatter of screen-space gradients."""
    params, camera, alive, settings = setup
    settings = settings.replace(backend="pallas")
    mesh = make_mesh(n_gauss=2, n_tile=4)
    sp, sa = shard_params(params, alive, mesh)
    sr = make_sharded_render(mesh, settings, 128, 128)

    def loss_single(p):
        return (render(camera, p, alive, settings, jnp.zeros(3))["render"] ** 2).sum()

    def loss_sharded(p):
        return (sr(camera, p, sa, jnp.zeros(3))["render"] ** 2).sum()

    g_ref = jax.jit(jax.grad(loss_single))(params)
    g_sh = jax.jit(jax.grad(loss_sharded))(sp)
    for name in ("xyz", "opacity", "scaling", "rotation", "features_dc"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_sh, name))
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-8)
        assert rel < 1e-5, f"{name}: rel {rel}"


def test_sharded_gradients_match(setup):
    params, camera, alive, settings = setup
    mesh = make_mesh(n_gauss=4, n_tile=2)
    sp, sa = shard_params(params, alive, mesh)
    sr = make_sharded_render(mesh, settings, 128, 128)

    def loss_single(p):
        return (render(camera, p, alive, settings, jnp.zeros(3))["render"] ** 2).sum()

    def loss_sharded(p):
        return (sr(camera, p, sa, jnp.zeros(3))["render"] ** 2).sum()

    g_ref = jax.jit(jax.grad(loss_single))(params)
    g_sh = jax.jit(jax.grad(loss_sharded))(sp)
    for name in ("xyz", "opacity", "scaling", "rotation", "features_dc"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_sh, name))
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-8)
        assert rel < 1e-5, f"{name}: rel {rel}"


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (1, 8)])
def test_sharded_train_step_matches_single_device(setup, mesh_shape):
    """The GSPMD train step on a multi-chip mesh must compute the SAME
    parameter update as the single-device step — the partitioner-placed
    gradient psum over tile shards is a reduction reorder, so tolerances
    are float-accumulation level, not bit-exact."""
    from gsplat_tpu.config import OptimizationConfig
    from gsplat_tpu.parallel.sharding import sharded_train_step
    from gsplat_tpu.train.step import init_train_state, make_train_step

    params, camera, alive, settings = setup
    opt = OptimizationConfig()
    h, w = camera.height, camera.width
    rng = np.random.default_rng(7)
    gt = jnp.asarray(rng.random((h, w, 3), np.float32))
    mask = jnp.ones((h, w, 1), jnp.float32)
    invd = jnp.zeros((h, w), jnp.float32)
    dmask = jnp.zeros((h, w), jnp.float32)
    bg = jnp.zeros(3)
    args = (camera, gt, mask, invd, dmask, bg,
            jnp.float32(1e-3), jnp.float32(1e-3), jnp.float32(0.0), jnp.int32(0))

    base_step = make_train_step(opt, settings)
    s0 = init_train_state(params, alive, num_images=4)
    ref_state, ref_metrics = base_step(s0, *args)

    mesh = make_mesh(*mesh_shape)
    step, place_state = sharded_train_step(mesh, opt, settings)
    sh_state, sh_metrics = step(place_state(init_train_state(params, alive, num_images=4)), *args)

    np.testing.assert_allclose(
        float(sh_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    for name in ("xyz", "opacity", "scaling", "rotation", "features_dc"):
        a = np.asarray(getattr(sh_state.params, name))
        b = np.asarray(getattr(ref_state.params, name))
        # atol headroom beyond pure f32 noise: the pipeline blends each band
        # in a shifted frame (mean2d - row0_px, rounded), so an instance
        # whose conic-cull Q sits exactly at the 1/255-threshold boundary
        # can flip in/out vs the single-device frame; a flipped instance
        # contributes < ~1/255 alpha, bounding the delta to ~1e-5
        np.testing.assert_allclose(a, b, atol=2e-5, err_msg=f"params.{name}")
    np.testing.assert_allclose(
        np.asarray(sh_state.stats["grad_accum"]),
        np.asarray(ref_state.stats["grad_accum"]),
        atol=1e-5,
    )


def test_pipeline_train_step_matches_single_device(setup):
    """The explicit shard_map pipeline train step (the production multi-chip
    path) must compute the same update as the single-device step."""
    from gsplat_tpu.config import OptimizationConfig
    from gsplat_tpu.parallel.pipeline import make_pipeline_train_step
    from gsplat_tpu.parallel.sharding import place_train_state
    from gsplat_tpu.train.step import init_train_state, make_train_step

    params, camera, alive, settings = setup
    opt = OptimizationConfig()
    h, w = camera.height, camera.width
    rng = np.random.default_rng(9)
    gt = jnp.asarray(rng.random((h, w, 3), np.float32))
    mask = jnp.ones((h, w, 1), jnp.float32)
    invd = jnp.zeros((h, w), jnp.float32)
    dmask = jnp.zeros((h, w), jnp.float32)
    args = (camera, gt, mask, invd, dmask, jnp.zeros(3),
            jnp.float32(1e-3), jnp.float32(1e-3), jnp.float32(0.0), jnp.int32(0))

    ref_state, ref_metrics = make_train_step(opt, settings)(
        init_train_state(params, alive, num_images=4), *args
    )

    mesh = make_mesh(n_gauss=4, n_tile=2)
    step = make_pipeline_train_step(mesh, opt, settings, w, h)
    sh_state, sh_metrics = step(
        place_train_state(mesh, init_train_state(params, alive, num_images=4)), *args
    )

    np.testing.assert_allclose(
        float(sh_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    for name in ("xyz", "opacity", "scaling", "rotation", "features_dc"):
        a = np.asarray(getattr(sh_state.params, name))
        b = np.asarray(getattr(ref_state.params, name))
        # atol headroom beyond pure f32 noise: the pipeline blends each band
        # in a shifted frame (mean2d - row0_px, rounded), so an instance
        # whose conic-cull Q sits exactly at the 1/255-threshold boundary
        # can flip in/out vs the single-device frame; a flipped instance
        # contributes < ~1/255 alpha, bounding the delta to ~1e-5
        np.testing.assert_allclose(a, b, atol=2e-5, err_msg=f"params.{name}")
    np.testing.assert_allclose(
        np.asarray(sh_state.stats["grad_accum"]),
        np.asarray(ref_state.stats["grad_accum"]),
        atol=1e-5,
    )


def test_gspmd_step_actually_partitions(setup):
    """A fully-replicated compilation would pass the numeric tests — assert
    the compiled GSPMD train step really communicates: its HLO must contain
    cross-device collectives (the tile-shard gradient reduction at minimum)."""
    from gsplat_tpu.config import OptimizationConfig
    from gsplat_tpu.parallel.sharding import sharded_train_step
    from gsplat_tpu.train.step import init_train_state

    params, camera, alive, settings = setup
    opt = OptimizationConfig()
    h, w = camera.height, camera.width
    gt = jnp.zeros((h, w, 3), jnp.float32)
    mask = jnp.ones((h, w, 1), jnp.float32)
    zeros = jnp.zeros((h, w), jnp.float32)
    args = (camera, gt, mask, zeros, zeros, jnp.zeros(3),
            jnp.float32(1e-3), jnp.float32(1e-3), jnp.float32(0.0), jnp.int32(0))

    mesh = make_mesh(n_gauss=4, n_tile=2)
    step, place_state = sharded_train_step(mesh, opt, settings)
    state = place_state(init_train_state(params, alive, num_images=2))
    hlo = step.lower(state, *args).compile().as_text()
    ops = [op for op in ("all-reduce", "all-gather", "reduce-scatter",
                         "collective-permute", "all-to-all") if op in hlo]
    assert ops, "compiled GSPMD step contains no cross-device collectives"


def test_multihost_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multihost(8, 2)


def test_band_exchange_matches_full_gather(setup):
    """The band-bucketed packet exchange (compact-to-band before the gather,
    docs/PERF_HEADROOM.md cost model) must be bit-exact vs the full-gather
    pipeline — forward render AND one full train step — and must report
    compaction overflow through instance_overflow when sized too small."""
    from gsplat_tpu.config import OptimizationConfig
    from gsplat_tpu.parallel.pipeline import make_pipeline_train_step
    from gsplat_tpu.parallel.sharding import place_train_state
    from gsplat_tpu.train.step import init_train_state

    params, camera, alive, settings = setup
    settings = settings.replace(backend="pallas")
    mesh = make_mesh(n_gauss=2, n_tile=4)
    sp, sa = shard_params(params, alive, mesh)

    full = jax.jit(make_sharded_render(mesh, settings, 128, 128))(
        camera, sp, sa, jnp.zeros(3)
    )
    # every shard row may intersect the band -> capacity = full shard is
    # always exact; the win comes from smaller capacities on real scenes
    n_loc = params.capacity // 2
    band = jax.jit(
        make_sharded_render(mesh, settings, 128, 128, exchange_capacity=n_loc)
    )(camera, sp, sa, jnp.zeros(3))
    assert int(band["instance_overflow"]) == 0
    np.testing.assert_array_equal(
        np.asarray(band["render"]), np.asarray(full["render"])
    )
    np.testing.assert_array_equal(
        np.asarray(band["invdepth"]), np.asarray(full["invdepth"])
    )

    # one train step: gradients flow through the compaction row-gather (its
    # transpose scatter-adds into the owning rows) — params must match the
    # full-gather pipeline exactly
    opt = OptimizationConfig()
    h, w = camera.height, camera.width
    rng = np.random.default_rng(11)
    gt = jnp.asarray(rng.random((h, w, 3), np.float32))
    mask = jnp.ones((h, w, 1), jnp.float32)
    zeros = jnp.zeros((h, w), jnp.float32)
    args = (camera, gt, mask, zeros, zeros, jnp.zeros(3),
            jnp.float32(1e-3), jnp.float32(1e-3), jnp.float32(0.0), jnp.int32(0))

    step_full = make_pipeline_train_step(mesh, opt, settings, w, h)
    step_band = make_pipeline_train_step(
        mesh, opt, settings, w, h, exchange_capacity=n_loc
    )
    st_full, m_full = step_full(
        place_train_state(mesh, init_train_state(params, alive, num_images=4)), *args
    )
    st_band, m_band = step_band(
        place_train_state(mesh, init_train_state(params, alive, num_images=4)), *args
    )
    np.testing.assert_array_equal(float(m_band["loss"]), float(m_full["loss"]))
    # params after the step are allclose, not bitwise: the gradient
    # reduction (ops/reduce.py) sorts per-instance rows by gid with an
    # UNSTABLE sort, so the f32 summation order within one gaussian depends
    # on the instance-buffer layout, which differs between the band
    # (exchange_capacity rows) and full (whole-shard) pipelines — ulp-level
    # drift only (forward render/loss above are still bit-exact)
    for name in ("xyz", "opacity", "scaling", "rotation", "features_dc"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_band.params, name)),
            np.asarray(getattr(st_full.params, name)),
            rtol=1e-5, atol=1e-7,
            err_msg=f"params.{name}",
        )

    # undersized exchange must surface as overflow, not silent truncation —
    # on the dedicated band_overflow metric (which drives the exchange
    # controller), NOT on instance_overflow (which would grow/recompile the
    # instance buffer for an overflow it never had)
    tiny = jax.jit(
        make_sharded_render(mesh, settings, 128, 128, exchange_capacity=16)
    )(camera, sp, sa, jnp.zeros(3))
    assert int(tiny["band_overflow"]) > 0
