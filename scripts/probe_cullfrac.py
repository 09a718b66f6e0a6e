#!/usr/bin/env python
"""Cull fraction on the synthetic bench scenes: emitted (tight-AABB)
instances vs post-conic-cull live instances at the 262k and garden points.
Round-4 result: 19.1% at both scales (isotropic splats ~ the
circle-in-AABB bound); trained scenes measure 31-35% (bench_trained).
Sized the run-trimmed-emission decision (docs/PERF_HEADROOM.md round 4).
"""
import json

import numpy as np
import jax

from __graft_entry__ import _tiny_scene
from gsplat_tpu.capacity import probe_instance_capacity, round128
from gsplat_tpu.core.types import make_render_settings
from gsplat_tpu.ops.projection import preprocess
from gsplat_tpu.ops.binning import pack_bins
from gsplat_tpu.render import grid_dims

for n in (262_144, 1_048_576):
    params, alive, camera = _tiny_scene(n=n, width=1920, height=1080,
                                        sh_degree=3, capacity=n)
    holder = type("H", (), {"camera": camera})
    peak = probe_instance_capacity(params, alive, [holder])
    settings = make_render_settings(sh_degree=3, max_per_tile=2048,
                                    instance_capacity=round128(peak),
                                    backend="pallas")
    gx, gy = grid_dims(camera, 16)
    screen = preprocess(params, alive, camera, settings, gx, gy)
    bins = jax.jit(lambda s: pack_bins(s, gx, gy, settings.instance_capacity,
                                       16, True))(screen)
    live = int((np.asarray(bins.tile_id) < gx * gy).sum())
    print(json.dumps({"n": n, "emitted": int(peak), "live": live,
                      "cull_frac": round(1 - live / peak, 4)}))
