#!/usr/bin/env python
"""Metrics CLI — SSIM/PSNR/LPIPS over rendered image dirs (reference
`metrics.py:36-103`). Writes `results.json` and `per_view.json` in the model
dir, same schema as the reference."""

from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser

import numpy as np


def read_images(renders_dir, gt_dir):
    from PIL import Image

    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        with Image.open(os.path.join(renders_dir, fname)) as r:
            renders.append(np.asarray(r.convert("RGB"), np.float32) / 255.0)
        with Image.open(os.path.join(gt_dir, fname)) as g:
            gts.append(np.asarray(g.convert("RGB"), np.float32) / 255.0)
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths):
    import jax
    import jax.numpy as jnp

    from gsplat_tpu.eval.lpips_jax import lpips, lpips_available
    from gsplat_tpu.train.losses import psnr, ssim

    ssim_j = jax.jit(ssim)
    psnr_j = jax.jit(psnr)
    lpips_j = jax.jit(lpips) if lpips_available() else None
    if lpips_j is None:
        if os.environ.get("GSPLAT_LPIPS_WEIGHTS"):
            # weights explicitly requested but unusable: fail loudly rather
            # than silently publishing a results.json with lpips null
            raise FileNotFoundError(
                "GSPLAT_LPIPS_WEIGHTS is set but the file does not exist: "
                f"{os.environ['GSPLAT_LPIPS_WEIGHTS']!r}"
            )
        print("WARNING: LPIPS weights unavailable — reporting LPIPS as null "
              "with LPIPS_status='weights_unavailable' "
              "(set GSPLAT_LPIPS_WEIGHTS; see gsplat_tpu/eval/lpips_jax.py)",
              file=sys.stderr)

    for model_path in model_paths:
        print(f"Scene: {model_path}")
        full, per_view = {}, {}
        test_dir = os.path.join(model_path, "test")
        try:
            methods = sorted(os.listdir(test_dir))
        except FileNotFoundError:
            print(f"  no test renders in {model_path}", file=sys.stderr)
            continue
        for method in methods:
            print(f"  Method: {method}")
            mdir = os.path.join(test_dir, method)
            renders, gts, names = read_images(
                os.path.join(mdir, "renders"), os.path.join(mdir, "gt")
            )
            ssims, psnrs, lpipss = [], [], []
            for r, g in zip(renders, gts):
                rj, gj = jnp.asarray(r), jnp.asarray(g)
                # device scalars; one host sync for the whole sweep below
                ssims.append(ssim_j(rj, gj))
                psnrs.append(psnr_j(rj, gj))
                lpipss.append(lpips_j(rj, gj) if lpips_j else None)
            ssims = [float(x) for x in jax.device_get(ssims)]
            psnrs = [float(x) for x in jax.device_get(psnrs)]
            if lpips_j:
                lpipss = [float(x) for x in jax.device_get(lpipss)]
            print(f"    SSIM : {np.mean(ssims):.7f}")
            print(f"    PSNR : {np.mean(psnrs):.7f}")
            if lpips_j:
                lpips_full = float(np.mean(lpipss))
                lpips_per_view = dict(zip(names, lpipss))
                print(f"    LPIPS: {lpips_full:.7f}")
            else:
                # keep LPIPS numeric-or-null so downstream numeric consumers
                # don't break; the separate status field says why it's null
                # (see module docstring of gsplat_tpu/eval/lpips_jax.py for
                # how to provide weights)
                lpips_full = None
                lpips_per_view = {n: None for n in names}
            full[method] = {
                "SSIM": float(np.mean(ssims)),
                "PSNR": float(np.mean(psnrs)),
                "LPIPS": lpips_full,
            }
            if not lpips_j:
                full[method]["LPIPS_status"] = "weights_unavailable"
            per_view[method] = {
                "SSIM": dict(zip(names, ssims)),
                "PSNR": dict(zip(names, psnrs)),
                "LPIPS": lpips_per_view,
            }
        with open(os.path.join(model_path, "results.json"), "w") as f:
            json.dump(full, f, indent=2)
        with open(os.path.join(model_path, "per_view.json"), "w") as f:
            json.dump(per_view, f, indent=2)


def main(argv=None):
    parser = ArgumentParser(description="gsplat_tpu metrics")
    parser.add_argument(
        "--model_paths", "-m", required=True, nargs="+", type=str
    )
    parser.add_argument(
        "--cpu",
        action="store_true",
        help="compute metrics on host CPU instead of the accelerator "
        "(SSIM/PSNR are bandwidth-trivial; avoids uploading every PNG to "
        "the device, which dominates wall time on remote-attached chips)",
    )
    args = parser.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    evaluate(args.model_paths)
    return 0


if __name__ == "__main__":
    sys.exit(main())
