"""Instance-buffer sizing shared by the training loop and the CLIs.

The (gaussian, tile)-instance buffer has a static compiled capacity
(`ops/binning.py`), and every capacity-proportional stage of the pipeline
(the instance sort, chunk gathers, the backward segment reductions) pays per
compiled slot whether or not a real instance fills it. These helpers size
that buffer to the actual scene — the TPU analogue of the reference's
dynamic buffer resize (`rasterize_points.cu:27-33`, `resizeFunctional`).
"""

from __future__ import annotations

import jax


def next_pow2(n: int) -> int:
    """Smallest power of two >= n, floored at 2^17 (sub-128k buffers save
    nothing measurable but multiply recompiles)."""
    return 1 << max(17, int(n - 1).bit_length())


def round128(n: int) -> int:
    """Smallest multiple of 128 >= n — exact sizing for a fixed camera set
    (every capacity-proportional pass pays ~17ns/row, so prefer this over
    next_pow2 whenever recompiles are not a concern)."""
    return max(128, (int(n) + 127) // 128 * 128)


def probe_instance_capacity(params, alive, cams, settings_probe=None):
    """Peak (gaussian, tile)-instance count over the given cameras.

    Runs only the per-gaussian preprocess (no binning/blend) and sums
    tiles_touched — exactly the count the instance buffer must hold
    (capacity is checked pre-cull in `ops/binning.py`).
    """
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.ops.projection import preprocess

    settings = settings_probe or make_render_settings(
        sh_degree=0, instance_capacity=1, max_per_tile=1
    )
    fns = {}
    peak = 0
    for cam in cams:
        key = (cam.camera.width, cam.camera.height)
        if key not in fns:
            gx = (key[0] + settings.tile - 1) // settings.tile
            gy = (key[1] + settings.tile - 1) // settings.tile
            fns[key] = jax.jit(
                lambda p, a, c, gx=gx, gy=gy: preprocess(
                    p, a, c, settings, gx, gy
                ).tiles_touched.sum()
            )
        peak = max(peak, int(fns[key](params, alive, cam.camera)))
    return peak


class CapacityController:
    """Grow/shrink policy for the compiled instance capacity during training.

    Fed one observation per log step (the instance count and overflow the
    train step reported), it returns the new capacity when a resize is due,
    else None. Policy:

    - GROW immediately on overflow or at >70% utilization — densification
      raises the count between observations, and overflow silently drops the
      farthest instances until the next log-gated host sync sees it.
    - SHRINK only on a sustained >=4x gap: the observation window restarts
      every `window` steps, and a shrink fires when a full window's peak
      would fit in a quarter of the current capacity (a recompile costs far
      more than a 2x misfit; an all-time peak — e.g. the pre-prune init
      spike — must not block shrinking forever, hence the rolling restart).
    - A `notify_structural_change()` (a mass prune / opacity-reset round)
      restarts the window at a short `event_window`, so the shrink decision
      comes a few observations after the event instead of up to a full
      window later (the init->first-prune capacity gap costs ~6x per-step
      time; waiting 500 iterations to react was ~20% of a 7k-iter run).
    """

    def __init__(self, capacity: int, window: int = 50, event_window: int = 5):
        self.capacity = int(capacity)
        self.window = window
        self.event_window = max(1, min(event_window, window))
        self._peak = 0
        self._logs = 0
        self._target = window

    def _reset(self):
        self._peak = 0
        self._logs = 0
        self._target = self.window

    def notify_structural_change(self):
        """The instance regime just changed (e.g. a big prune): restart the
        observation window short so the next shrink check comes early."""
        self._peak = 0
        self._logs = 0
        self._target = self.event_window

    def update(self, n_instances: int, overflow: int) -> int | None:
        self._peak = max(self._peak, int(n_instances))
        self._logs += 1
        if overflow > 0 or n_instances > 0.7 * self.capacity:
            self.capacity = next_pow2(max(2 * int(n_instances), 2 * self.capacity))
            self._reset()
            return self.capacity
        if self._logs >= self._target:
            shrunk = next_pow2(2 * self._peak)
            self._reset()
            if shrunk <= self.capacity // 4:
                self.capacity = shrunk
                return self.capacity
        return None


def resolve_instance_capacity(configured: int, params, alive, cams, margin=2.0):
    """configured > 0 -> fixed; 0 -> probe the cameras and size with margin."""
    if configured:
        return configured
    peak = probe_instance_capacity(params, alive, cams)
    cap = next_pow2(int(margin * max(peak, 1)))
    print(f"[auto] instance capacity {cap} (probe peak {peak})")
    return cap
