#!/usr/bin/env python
"""Wall-clock render + train-step on a TRAINED checkpoint (real-scene
statistics: anisotropic thin splats, polarized opacities) — the regime the
conic-metric cull targets, which the synthetic bench scene under-represents.

Usage: python -m scripts.bench_trained [model_dir] [iteration]
Prints JSON lines with per-config times and the live-instance count, with
tight_cull on vs off for the cull's measured effect.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main(model_dir="output/full_eval_r3/chair", iteration=30000):
    from gsplat_tpu.capacity import probe_instance_capacity, round128
    from gsplat_tpu.core.types import make_render_settings
    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.io.snapshot import load_snapshot
    from gsplat_tpu.ops.binning import pack_bins
    from gsplat_tpu.ops.projection import preprocess
    from gsplat_tpu.render import render, grid_dims

    params, alive, it, _ = load_snapshot(model_dir, iteration)
    # source path from cfg_args
    import re

    cfg = open(f"{model_dir}/cfg_args").read()
    m = re.search(r"source_path='([^']+)'", cfg)
    scene = Scene(m.group(1), model_path=None, images="images", depths="",
                  resolution=-1, white_background=True, eval=True,
                  train_test_exp=False, shuffle=False)
    cam = scene.get_train_cameras()[0].camera
    gx, gy = grid_dims(cam, 16)
    holder = type("H", (), {"camera": cam})
    # probe per cull setting: tight_cull=False emits the larger reference-
    # rect count, so the cull-off baseline needs its own (bigger) capacity
    # or it would silently truncate and flatter the cull
    peaks = {}
    for tc in (True, False):
        sp = make_render_settings(sh_degree=0, instance_capacity=1,
                                  max_per_tile=1, tight_cull=tc)
        peaks[tc] = int(probe_instance_capacity(params, alive, [holder],
                                                settings_probe=sp))
    print(json.dumps({"model": model_dir, "n_gauss": int(np.asarray(alive).sum()),
                      "peak_instances": peaks[True],
                      "peak_instances_nocull": peaks[False]}), flush=True)

    # (tight_cull, blend_mode, packet_dtype): cull on/off isolates the conic
    # cull's win on real statistics; the OIT rows answer whether no-scan
    # commutative blending loses its advantage on a CONVERGED scene (sorted
    # early-stops on saturated pixels, OIT cannot); the bf16 rows measure the
    # sort-payload + DMA saving on real statistics.
    for tc, mode, pdt in ((True, "sorted", "float32"),
                          (False, "sorted", "float32"),
                          (True, "oit", "float32"),
                          (True, "sorted", "bfloat16"),
                          (True, "oit", "bfloat16")):
        settings = make_render_settings(
            sh_degree=3, max_per_tile=2048, instance_capacity=round128(peaks[tc]),
            backend="pallas", tight_cull=tc, blend_mode=mode, packet_dtype=pdt,
        )

        def loss_fn(p, a):
            out = render(cam, p, a, settings, jnp.ones(3))
            return out["render"].mean()

        step = jax.jit(jax.grad(loss_fn))
        g = step(params, alive)
        float(np.asarray(jax.tree_util.tree_leaves(g)[0]).ravel()[0])
        # live instances under this cull setting
        screen = preprocess(params, alive, cam, settings, gx, gy)
        bins = jax.jit(lambda s: pack_bins(s, gx, gy, settings.instance_capacity,
                                           16, tc))(screen)
        k_live = int((np.asarray(bins.tile_id) < gx * gy).sum())
        assert int(bins.overflow) == 0, f"overflow {int(bins.overflow)} (tc={tc})"
        for attempt in range(4):
            t0 = time.perf_counter()
            for _ in range(8):
                g = step(params, alive)
            float(np.asarray(jax.tree_util.tree_leaves(g)[0]).ravel()[0])
            ms = (time.perf_counter() - t0) / 8 * 1e3
            if ms >= 3.0:
                break
        print(json.dumps({"tight_cull": tc, "blend_mode": mode,
                          "packet_dtype": pdt, "fwd_bwd_ms": round(ms, 2),
                          "live_instances": k_live}), flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*( [a[0]] if a else [] ), **({"iteration": int(a[1])} if len(a) > 1 else {}))
