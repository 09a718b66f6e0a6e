#!/usr/bin/env python
"""On-chip forward+backward validation: Pallas kernels vs the jnp oracle on
the REAL device (the hardware twin of tests/test_pallas_blend.py, which only
covers the CPU interpreter). Reference pattern: the AIE golden kernel tests
run against real hardware (`GS-IRON/npu-1/NPU/test.cpp:377-382`).

Prints max/mean differences for the render outputs and all parameter
gradients. This script caught a real hardware-only bug in round 2: the blend
kernels' feature/gradient matmuls ran at the MXU's default single-pass bf16
precision — ~4e-3 relative error in every color and gradient — which the CPU
interpreter (where the test suite runs) silently computes in exact f32.
With precision=HIGHEST everywhere, measured hardware agreement (v5e,
2026-08-19): outputs <= 5.4e-7 abs, all parameter gradients <= 3.2e-7
relative, zero pixels above 1e-4.

Exit code 0 = all checks pass. Run on the TPU; takes ~3 minutes of compiles.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from gsplat_tpu.core.types import make_render_settings
from gsplat_tpu.render import render
from tests.oracle.reference_math import make_test_scene
from tests.test_forward_vs_oracle import scene_to_inputs

# float-accumulation level, with headroom over the measured ~5e-7 / ~3e-7;
# a blend-decision flip (an instance exactly on the alpha >= 1/255 or
# T >= 1e-4 cutoff evaluated differently) would show up in the flip fraction
OUT_MAX_TOL = 1e-4
OUT_MEAN_TOL = 1e-6
FLIP_FRACTION_TOL = 1e-4  # fraction of pixels allowed above 1e-4 abs diff
GRAD_REL_TOL = 1e-5


def main():
    print(f"devices: {jax.devices()}")
    # scene sized so the jnp oracle's autodiff (which saves every scan chunk
    # of (T, 256, chunk) intermediates) fits in 16GB HBM
    sc = make_test_scene(
        np.random.default_rng(42), n=4000, width=192, height=160, sh_degree=3
    )
    params, camera, alive = scene_to_inputs(sc)
    base = dict(sh_degree=3, max_per_tile=2048, instance_capacity=1 << 17)

    def run(backend):
        settings = make_render_settings(backend=backend, **base)

        def loss(p):
            out = render(camera, p, alive, settings, jnp.zeros(3))
            return (
                (out["render"] ** 2).sum() + 0.3 * (out["invdepth"] ** 2).sum(),
                out,
            )

        (l, out), grads = jax.jit(
            jax.value_and_grad(loss, has_aux=True), static_argnums=()
        )(params)
        jax.block_until_ready(grads)
        return out, grads

    out_j, g_j = run("jnp")
    out_p, g_p = run("pallas")

    failures = []
    npix = np.prod(np.asarray(out_j["render"]).shape[:2])
    for key in ("render", "invdepth", "final_t"):
        a = np.asarray(out_j[key])
        b = np.asarray(out_p[key])
        d = np.abs(a - b)
        flips = (d > 1e-4).sum() / d.size
        line = (f"{key:10s} max {d.max():.3e}  mean {d.mean():.3e}  "
                f"pix>1e-4: {100*flips:.4f}%")
        ok = d.max() < OUT_MAX_TOL and d.mean() < OUT_MEAN_TOL and flips < FLIP_FRACTION_TOL
        print(("PASS " if ok else "FAIL ") + line)
        if not ok:
            failures.append(key)

    for name in ("xyz", "scaling", "rotation", "opacity", "features_dc", "features_rest"):
        a = np.asarray(getattr(g_j, name))
        b = np.asarray(getattr(g_p, name))
        scale = np.abs(a).max() + 1e-12
        rel = np.abs(a - b).max() / scale
        ok = rel < GRAD_REL_TOL
        print(("PASS " if ok else "FAIL ") + f"grad {name:14s} max rel {rel:.3e}")
        if not ok:
            failures.append(f"grad:{name}")

    # OIT mode on hardware: pallas OIT (raw-sum custom VJP incl. the
    # gradient reduction) vs the jnp OIT oracle's autodiff
    def run_oit(backend):
        settings = make_render_settings(
            backend=backend, blend_mode="oit", **base
        )

        def loss(p):
            out = render(camera, p, alive, settings, jnp.zeros(3))
            return (
                (out["render"] ** 2).sum() + 0.3 * (out["invdepth"] ** 2).sum(),
                out,
            )

        (l, out), grads = jax.jit(jax.value_and_grad(loss, has_aux=True))(params)
        jax.block_until_ready(grads)
        return out, grads

    oit_j, og_j = run_oit("jnp")
    oit_p, og_p = run_oit("pallas")
    d = np.abs(np.asarray(oit_j["render"]) - np.asarray(oit_p["render"]))
    ok = d.max() < OUT_MAX_TOL and d.mean() < OUT_MEAN_TOL
    print(("PASS " if ok else "FAIL ") + f"oit render: max {d.max():.3e} mean {d.mean():.3e}")
    if not ok:
        failures.append("oit:render")
    for name in ("xyz", "scaling", "rotation", "opacity", "features_dc"):
        a = np.asarray(getattr(og_j, name))
        b = np.asarray(getattr(og_p, name))
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        ok = rel < GRAD_REL_TOL
        print(("PASS " if ok else "FAIL ") + f"oit grad {name:10s} max rel {rel:.3e}")
        if not ok:
            failures.append(f"oit:{name}")

    # bf16 packet mode: within the reference's own bf16 kernel tolerances
    # (`GS-IRON/npu-1/NPU/test.cpp:88,233-238`: abs 0.05-0.5)
    settings_bf = make_render_settings(
        backend="pallas", packet_dtype="bfloat16", **base
    )
    out_bf = jax.jit(lambda p: render(camera, p, alive, settings_bf, jnp.zeros(3)))(params)
    d = np.abs(np.asarray(out_bf["render"]) - np.asarray(out_j["render"]))
    ok = d.max() < 0.5 and d.mean() < 5e-3
    print(("PASS " if ok else "FAIL ") + f"bf16 packets: max {d.max():.3e} mean {d.mean():.3e}")
    if not ok:
        failures.append("bf16")

    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("all hardware fwd+bwd checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
