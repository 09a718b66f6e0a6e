"""Auto instance-capacity policy (gsplat_tpu/capacity.py).

The buffer is compiled-static; the controller must grow BEFORE silent
truncation lingers and must shrink once the live count sustainably drops
(the pre-prune init spike must not pin the capacity forever — the regression
the windowed peak exists for).
"""

from gsplat_tpu.capacity import CapacityController, next_pow2, round128


def test_next_pow2_floor():
    assert next_pow2(1) == 1 << 17
    assert next_pow2((1 << 20) + 1) == 1 << 21
    assert next_pow2(1 << 20) == 1 << 20


def test_round128():
    assert round128(1) == 128
    assert round128(128) == 128
    assert round128(129) == 256


def test_grow_on_overflow():
    c = CapacityController(1 << 18)
    assert c.update(1 << 18, overflow=5) == 1 << 19


def test_grow_at_high_utilization_before_overflow():
    c = CapacityController(1 << 20)
    grew = c.update(int(0.8 * (1 << 20)), overflow=0)
    assert grew == 1 << 21  # 2x current, not 2x count


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
    assert changed[-1] == next_pow2(200_000)
    assert c.capacity == 1 << 18


def test_shrink_requires_4x_gap():
    c = CapacityController(1 << 20)
    for _ in range(50):
        out = c.update((1 << 18) + 1, overflow=0)  # 2x gap only
    assert out is None and c.capacity == 1 << 20


def test_event_notification_shortens_shrink_latency():
    c = CapacityController(1 << 23, window=50, event_window=5)
    c.update(3_000_000, overflow=0)  # init spike
    c.notify_structural_change()     # mass prune happened
    out = [c.update(100_000, overflow=0) for _ in range(5)]
    assert out[:-1] == [None] * 4
    assert out[-1] == next_pow2(200_000)  # shrink after 5 obs, not 50
    # back to the normal window afterwards
    for _ in range(49):
        assert c.update(100_000, overflow=0) is None


def test_event_window_does_not_force_shrink_without_gap():
    c = CapacityController(1 << 20, window=50, event_window=5)
    c.notify_structural_change()
    out = [c.update((1 << 18) + 1, overflow=0) for _ in range(5)]
    assert all(o is None for o in out) and c.capacity == 1 << 20
