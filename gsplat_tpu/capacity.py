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


def resolve_instance_capacity(configured: int, params, alive, cams, margin=2.0):
    """configured > 0 -> fixed; 0 -> probe the cameras and size with margin."""
    if configured:
        return configured
    peak = probe_instance_capacity(params, alive, cams)
    cap = next_pow2(int(margin * max(peak, 1)))
    print(f"[auto] instance capacity {cap} (probe peak {peak})")
    return cap
