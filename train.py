#!/usr/bin/env python
"""Training CLI — the `train.py` analogue of the reference (`train.py:254-285`).

Usage:
    python train.py -s <dataset path> [-m <model out>] [--iterations 30000] ...

All reference flags are mirrored via config reflection (gsplat_tpu/config.py);
extra TPU-side flags live in PipelineConfig (--backend jnp|pallas,
--instance_capacity, --capacity).
"""

from __future__ import annotations

import os
import sys
import uuid
from argparse import ArgumentParser

from gsplat_tpu.config import (
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    add_to_parser,
    extract,
    save_cfg_args,
)


def main(argv=None):
    parser = ArgumentParser(description="gsplat_tpu training")
    add_to_parser(parser, ModelConfig(), "Loading Parameters")
    add_to_parser(parser, OptimizationConfig(), "Optimization Parameters")
    add_to_parser(parser, PipelineConfig(), "Pipeline Parameters")
    parser.add_argument("--test_iterations", nargs="+", type=int, default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[7_000, 30_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument(
        "--checkpoint_every", type=int, default=0,
        help="write a rolling recovery checkpoint every N iterations "
        "(atomic overwrite of <model>/rolling_chkpnt.pkl)",
    )
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument(
        "--seed", type=int, default=0,
        help="RNG seed (camera pick order, densify split sampling); the "
        "reference is unseeded CUDA nondeterminism, ours is reproducible",
    )
    parser.add_argument("--log_every", type=int, default=10)
    parser.add_argument(
        "--profile_steps", type=int, default=0,
        help="capture a jax.profiler trace of N steps (written to "
        "<model>/profile; the reference's AIE packet-trace analogue)",
    )
    parser.add_argument("--disable_viewer", action="store_true")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument(
        "--debug_from", type=int, default=-1,
        help="from this iteration on, synchronize every step and fail fast "
        "on a non-finite loss (the reference's per-kernel CHECK_CUDA sync, "
        "`auxiliary.h:178-185`, enabled at `--debug_from`)",
    )
    parser.add_argument(
        "--detect_anomaly", action="store_true",
        help="enable jax_debug_nans: every jitted program re-runs op-by-op "
        "when it produces a NaN and raises at the op (the torch "
        "autograd.set_detect_anomaly analogue, reference `train.py:263,58`)",
    )
    args = parser.parse_args(argv)
    args.save_iterations.append(args.iterations)

    model_cfg = extract(ModelConfig, args)
    opt_cfg = extract(OptimizationConfig, args)
    pipe_cfg = extract(PipelineConfig, args)

    if not model_cfg.source_path:
        parser.error("-s/--source_path is required")
    if not model_cfg.model_path:
        import dataclasses

        model_cfg = dataclasses.replace(
            model_cfg, model_path=os.path.join("./output", str(uuid.uuid4())[:10])
        )
    print(f"Optimizing {model_cfg.model_path}")
    os.makedirs(model_cfg.model_path, exist_ok=True)
    save_cfg_args(model_cfg.model_path, model_cfg)

    if args.detect_anomaly:
        import jax

        jax.config.update("jax_debug_nans", True)

    from gsplat_tpu.train.loop import train

    gui_server = None
    if not args.disable_viewer:
        try:
            from gsplat_tpu.viewer.network_gui import NetworkGUI

            gui_server = NetworkGUI(args.ip, args.port)
        except Exception as e:  # viewer is best-effort, never blocks training
            print(f"[viewer] disabled: {e}", file=sys.stderr)

    on_iteration = gui_server.make_training_hook(model_cfg, pipe_cfg) if gui_server else None

    if args.profile_steps > 0:
        # jax.profiler trace window — the TPU-side analogue of the reference's
        # AIE packet tracing (`GS-IRON/npu-1/NPU/precomp.py:191-204`) and
        # torch.cuda.Event timing (`train.py:60-61`); view with tensorboard
        # or xprof.
        import jax

        prof_dir = os.path.join(model_cfg.model_path, "profile")
        gui_hook = on_iteration

        def profile_hook(iteration, state, metrics, _state={"on": False}):
            if iteration == 2 and not _state["on"]:
                jax.profiler.start_trace(prof_dir)
                _state["on"] = True
            elif _state["on"] and iteration >= 2 + args.profile_steps:
                jax.profiler.stop_trace()
                _state["on"] = False
                print(f"[profile] trace written to {prof_dir}")
            if gui_hook:
                gui_hook(iteration, state, metrics)

        on_iteration = profile_hook

    if args.debug_from >= 0:
        import math

        import jax

        inner_hook = on_iteration

        def debug_hook(iteration, state, metrics):
            if iteration >= args.debug_from:
                jax.block_until_ready(metrics)
                loss = float(metrics["loss"])
                if not math.isfinite(loss):
                    raise FloatingPointError(
                        f"[debug] non-finite loss at iteration {iteration}: {loss}"
                    )
            if inner_hook:
                inner_hook(iteration, state, metrics)

        on_iteration = debug_hook
    try:
        state, scene, results = train(
            model_cfg,
            opt_cfg,
            pipe_cfg,
            testing_iterations=tuple(args.test_iterations),
            saving_iterations=tuple(args.save_iterations),
            checkpoint_iterations=tuple(args.checkpoint_iterations),
            start_checkpoint=args.start_checkpoint,
            quiet=args.quiet,
            log_every=args.log_every,
            on_iteration=on_iteration,
            checkpoint_every=args.checkpoint_every,
            seed=args.seed,
        )
    finally:
        if gui_server:
            gui_server.close()

    print("\nTraining complete.")
    for it, ev in results.get("test", {}).items():
        print(f"  iter {it}: test PSNR {ev['psnr']:.2f}  L1 {ev['l1']:.5f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
