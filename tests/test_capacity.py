"""Auto capacity policy (gsplat_tpu/capacity.py) + gaussian-axis resize.

Both padded axes are compiled-static; the controller must grow BEFORE silent
truncation lingers and must shrink once the live count sustainably drops
(the pre-prune init spike must not pin the capacity forever — the regression
the windowed peak exists for). Capacities live on a quarter-pow2 ladder:
every capacity-proportional stage pays per compiled slot, so pow2-with-2x-
margin (up to 4x padding) measurably ~3x'd the lego train step.
"""

import numpy as np

from gsplat_tpu.capacity import (
    CapacityController,
    next_pow2,
    quantize_capacity,
    round128,
)


def test_next_pow2_floor():
    assert next_pow2(1) == 1 << 17
    assert next_pow2((1 << 20) + 1) == 1 << 21
    assert next_pow2(1 << 20) == 1 << 20


def test_round128():
    assert round128(1) == 128
    assert round128(128) == 128
    assert round128(129) == 256


def test_quantize_capacity_ladder():
    assert quantize_capacity(1) == 1 << 17  # floor
    assert quantize_capacity(1 << 20) == 1 << 20  # exact rung
    assert quantize_capacity((1 << 20) + 1) == (1 << 20) * 5 // 4  # next rung
    assert quantize_capacity(int(1.3 * (1 << 20))) == (1 << 20) * 3 // 2
    assert quantize_capacity(int(1.8 * (1 << 20))) == 1 << 21
    # rungs are 128-aligned (kernel chunk alignment)
    for n in [300_000, 1_000_001, 5_000_000]:
        assert quantize_capacity(n) % 128 == 0
        assert quantize_capacity(n) >= n
        assert quantize_capacity(n) <= 1.25 * n + 1  # bounded overshoot


def test_grow_on_overflow_doubles():
    c = CapacityController(1 << 18, floor=1 << 17)
    assert c.update(1 << 18, overflow=5) == 1 << 19


def test_grow_at_high_utilization_before_overflow():
    c = CapacityController(1 << 20)
    grew = c.update(int(0.8 * (1 << 20)), overflow=0)
    # 1.6 * count on the ladder (>= 1.25x current capacity)
    assert grew == quantize_capacity(int(1.6 * 0.8 * (1 << 20)))
    assert grew >= (1 << 20) * 5 // 4


def test_grow_is_at_least_a_ladder_step():
    # count just over the threshold must still move capacity a full rung
    c = CapacityController(1 << 20)
    grew = c.update(int(0.71 * (1 << 20)), overflow=0)
    assert grew is not None and grew >= (1 << 20) * 5 // 4


def test_no_resize_in_band():
    c = CapacityController(1 << 20)
    for _ in range(49):
        assert c.update(1 << 18, overflow=0) is None


def test_shrink_after_window_rolls_past_spike():
    c = CapacityController(1 << 23)
    # window 1 contains the init spike: no shrink at its close
    c.update(3_000_000, overflow=0)
    for _ in range(49):
        assert c.update(100_000, overflow=0) is None
    # window 2 sees only the post-prune counts: shrink fires at its close
    changed = [c.update(100_000, overflow=0) for _ in range(50)]
    assert changed[:-1] == [None] * 49
    assert changed[-1] == quantize_capacity(160_000)
    assert c.capacity == quantize_capacity(160_000)


def test_shrink_requires_sustained_gap():
    c = CapacityController(1 << 20)
    # peak * shrink_margin * shrink_gap > capacity: no shrink
    for _ in range(50):
        out = c.update(int(0.5 * (1 << 20)), overflow=0)
    assert out is None and c.capacity == 1 << 20


def test_event_notification_shortens_shrink_latency():
    c = CapacityController(1 << 23, window=50, event_window=5)
    c.update(3_000_000, overflow=0)  # init spike
    c.notify_structural_change()  # mass prune happened
    out = [c.update(100_000, overflow=0) for _ in range(5)]
    assert out[:-1] == [None] * 4
    assert out[-1] == quantize_capacity(160_000)  # shrink after 5 obs, not 50
    # back to the normal window afterwards
    for _ in range(49):
        assert c.update(100_000, overflow=0) is None


def test_event_window_does_not_force_shrink_without_gap():
    c = CapacityController(1 << 20, window=50, event_window=5)
    c.notify_structural_change()
    out = [c.update(int(0.5 * (1 << 20)), overflow=0) for _ in range(5)]
    assert all(o is None for o in out) and c.capacity == 1 << 20


# ---------------------------------------------------------------- resize ---


def _mini_state(capacity=512, n_alive=100, seed=0):
    import jax.numpy as jnp

    from gsplat_tpu.model import init_from_pcd
    from gsplat_tpu.train.step import init_train_state

    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n_alive, 3)).astype(np.float32)
    cols = rng.random((n_alive, 3)).astype(np.float32)
    params, alive = init_from_pcd(pts, cols, max_sh_degree=1, capacity=capacity)
    state = init_train_state(params, alive, num_images=3)
    # make per-row state distinguishable so we can check rows travel intact
    state = state.replace(
        adam_counts=jnp.arange(capacity, dtype=jnp.int32),
        adam_m=state.adam_m.replace(
            xyz=jnp.arange(capacity, dtype=jnp.float32)[:, None].repeat(3, 1)
        ),
    )
    return state


def test_resize_grow_pads_dead_rows():
    from gsplat_tpu.train.resize import resize_train_state

    state = _mini_state(capacity=512, n_alive=100)
    grown = resize_train_state(state, 1024)
    assert grown.params.capacity == 1024
    assert int(np.asarray(grown.alive).sum()) == 100
    # original rows unchanged
    np.testing.assert_array_equal(
        np.asarray(grown.params.xyz)[:512], np.asarray(state.params.xyz)
    )
    np.testing.assert_array_equal(
        np.asarray(grown.adam_counts)[:512], np.asarray(state.adam_counts)
    )
    # new rows are dead and sanitized (inert scale/opacity)
    assert not np.asarray(grown.alive)[512:].any()
    assert (np.asarray(grown.params.scaling)[512:] == -15.0).all()


def test_resize_shrink_compacts_alive_rows_with_their_state():
    import jax.numpy as jnp

    from gsplat_tpu.train.resize import resize_train_state

    state = _mini_state(capacity=512, n_alive=100)
    # scatter the alive rows: kill even rows, keep odd rows among the first 200
    alive = np.zeros(512, bool)
    alive[1:200:2] = True
    state = state.replace(alive=jnp.asarray(alive))
    shrunk = resize_train_state(state, 128)
    assert shrunk.params.capacity == 128
    assert int(np.asarray(shrunk.alive).sum()) == alive.sum()
    # alive rows moved to the front in original order, with their Adam state
    orig_ids = np.where(alive)[0]
    np.testing.assert_array_equal(
        np.asarray(shrunk.adam_counts)[: len(orig_ids)], orig_ids
    )
    np.testing.assert_array_equal(
        np.asarray(shrunk.params.xyz)[: len(orig_ids)],
        np.asarray(state.params.xyz)[orig_ids],
    )
    np.testing.assert_array_equal(
        np.asarray(shrunk.adam_m.xyz)[: len(orig_ids)],
        np.asarray(state.adam_m.xyz)[orig_ids],
    )


def test_resize_shrink_refuses_to_drop_alive_rows():
    import pytest

    from gsplat_tpu.train.resize import resize_train_state

    state = _mini_state(capacity=512, n_alive=200)
    with pytest.raises(ValueError):
        resize_train_state(state, 128)


def test_resize_roundtrip_preserves_render():
    """Grow then shrink-compact must not change what the model renders."""
    import jax.numpy as jnp

    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.data.cameras import make_camera
    from gsplat_tpu.render import render
    from gsplat_tpu.train.resize import resize_train_state

    state = _mini_state(capacity=512, n_alive=100)
    cam = make_camera(
        width=64, height=64, fovx=1.0, fovy=1.0,
        R=np.eye(3), T=np.array([0.0, 0.0, 5.0]),
    )
    settings = make_render_settings(
        sh_degree=1, instance_capacity=4096, max_per_tile=256, backend="jnp"
    )
    bg = jnp.zeros(3)

    def img(s):
        return np.asarray(
            render(cam, s.params, s.alive, settings, bg)["render"]
        )

    base = img(state)
    grown = resize_train_state(state, 1024)
    np.testing.assert_allclose(img(grown), base, atol=1e-6)
    shrunk = resize_train_state(grown, 256)
    np.testing.assert_allclose(img(shrunk), base, atol=1e-6)


def test_batched_probe_matches_per_camera():
    """probe_instance_capacity batches same-shape cameras into one lax.map
    dispatch (per-camera dispatch paid a tunnel round trip each); the peak
    must equal the naive per-camera loop, across mixed camera shapes."""
    import jax

    from gsplat_tpu.capacity import probe_instance_capacity
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.ops.projection import preprocess
    from tests.oracle.reference_math import make_test_scene
    from tests.test_forward_vs_oracle import scene_to_inputs

    rng = np.random.default_rng(11)
    params, _, alive = scene_to_inputs(make_test_scene(rng, n=500))
    cams = []
    for w, h, seed in [(64, 48, 0), (64, 48, 1), (96, 48, 2), (64, 48, 3)]:
        sc = make_test_scene(np.random.default_rng(seed), n=4, width=w, height=h)
        _, cam, _ = scene_to_inputs(sc)
        cams.append(type("H", (), {"camera": cam})())

    peak = probe_instance_capacity(params, alive, cams)
    settings = make_render_settings(sh_degree=0, instance_capacity=1, max_per_tile=1)
    from gsplat_tpu.ops.binning import compute_row_runs

    naive = 0
    for holder in cams:
        c = holder.camera
        gx = (c.width + 15) // 16
        gy = (c.height + 15) // 16
        screen = preprocess(params, alive, c, settings, gx, gy)
        _, _, _, tiles_post = compute_row_runs(
            screen, settings.tile, settings.tight_cull
        )
        naive = max(naive, int(tiles_post.sum()))
    assert peak == naive > 0
