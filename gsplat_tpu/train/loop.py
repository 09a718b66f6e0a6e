"""Host-side training driver (the `train.py:43-190` analogue).

The device work is one jitted step (`gsplat_tpu/train/step.py`); this loop
supplies what must stay on the host: random camera sampling without
replacement, LR/weight schedules, the SH-degree ramp (a static setting — at
most 3 retraces), densify/opacity-reset cadence, eval/save/checkpoint hooks,
and progress logging.
"""

from __future__ import annotations

import os
import pickle
import random
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp

from gsplat_tpu.config import ModelConfig, OptimizationConfig, PipelineConfig
from gsplat_tpu.core.types import make_render_settings
from gsplat_tpu.data.scene import Scene
from gsplat_tpu.model import init_from_pcd, round_up
from gsplat_tpu.render import render
from gsplat_tpu.train import losses
from gsplat_tpu.train.step import (
    init_train_state,
    make_densify_step,
    make_train_step,
    opacity_reset_step,
)
from gsplat_tpu.utils.general import expon_lr_func


_PIXEL_CACHE = {}
# HBM budget for cached camera pixel data. A lego/garden-class scene fits
# entirely (the reference likewise keeps every camera on the GPU up front,
# `scene/cameras.py:57`); a city-scale multi-thousand-view scene would OOM a
# 16GB chip, so beyond the budget the cache evicts least-recently-used views
# and pays the re-upload on revisit.
_PIXEL_CACHE_BYTES = 6 << 30


def _cache_nbytes(cache):
    return sum(
        sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in v)
        for k, v in cache.items()
        if isinstance(v, tuple)
    )


def _device_batch(cam, _cache=_PIXEL_CACHE):
    """Ship one LoadedCamera's pixel data to device, cached per camera (LRU).

    Device residency matters doubly here: the reference keeps every camera's
    tensors on the GPU up front (`scene/cameras.py:57`), and on this image
    host->device copies cross the axon tunnel (~seconds per 15MB re-upload).
    """
    key = (id(cam.image), cam.uid)
    if key in _cache:
        val = _cache.pop(key)  # reinsert for LRU recency order
        _cache[key] = val
        return val
    h, w = cam.image.shape[:2]
    gt = jnp.asarray(cam.image)
    mask = jnp.asarray(cam.alpha_mask)
    if cam.invdepth is not None:
        invd = jnp.asarray(cam.invdepth)
        dmask = jnp.asarray(cam.depth_mask[..., 0])
    else:
        # depthless cameras share ONE zeros array per shape (a fresh
        # 2x(H,W) per camera would burn ~1.5GB HBM on a 100-view scene)
        zkey = ("z", h, w)
        if zkey not in _cache:
            _cache[zkey] = jnp.zeros((h, w), jnp.float32)
        invd = dmask = _cache[zkey]
    entry = (gt, mask, invd, dmask)
    # evict down to budget INCLUDING the incoming entry, so the cache never
    # overshoots by one view's tensors (and a single over-budget view still
    # gets cached after evicting everything else — it's in use regardless)
    new_bytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in entry)
    while _cache_nbytes(_cache) + new_bytes > _PIXEL_CACHE_BYTES:
        oldest = next((k for k, v in _cache.items() if isinstance(v, tuple)), None)
        if oldest is None:
            break
        _cache.pop(oldest)
    _cache[key] = entry
    return _cache[key]


def _device_gt(cam, _cache={}):
    """gt-only device cache for eval loops (test views never need masks).

    Train views evaluated mid-training are already resident via
    _device_batch — reuse that copy instead of shipping a second one."""
    key = (id(cam.image), cam.uid)
    full = _PIXEL_CACHE.get(key)
    if full is not None:
        return full[0]
    if key not in _cache:
        _cache[key] = jnp.asarray(cam.image)
    return _cache[key]


from gsplat_tpu.capacity import CapacityController, quantize_capacity
from gsplat_tpu.capacity import probe_exchange_capacity, probe_instance_capacity
from gsplat_tpu.train.resize import resize_train_state


def save_checkpoint(path, state, iteration):
    """Atomic (tmp + rename) so a crash mid-write never corrupts the file a
    supervisor would resume from."""
    host_state = jax.tree.map(np.asarray, state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump({"state": host_state, "iteration": iteration}, f)
    os.replace(tmp, path)


# Rolling recovery checkpoints run on a single worker thread: the ~100MB
# device->host fetch over the TPU tunnel plus the pickle write stall the
# train loop ~5s each (measured it-4500 hiccup), ~60x per 30k run. The
# state pytree is immutable (functional updates), so fetching it
# concurrently with ongoing steps is race-free; one worker serializes
# writes so the atomic tmp+rename never interleaves.
_CKPT_POOL = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt")
_ckpt_pending: list = []


def save_checkpoint_async(path, state, iteration):
    _ckpt_flush()  # keep at most one in flight; skip is better than a queue
    _ckpt_pending.append(_CKPT_POOL.submit(save_checkpoint, path, state, iteration))


def _ckpt_flush():
    """Surface exceptions from (and wait for) any in-flight checkpoint."""
    while _ckpt_pending:
        _ckpt_pending.pop().result()


def load_checkpoint(path):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return jax.tree.map(jnp.asarray, blob["state"]), blob["iteration"]


_EVAL_FNS = {}


def _eval_fn(settings):
    """Jitted eval render, cached per settings (a fresh jit closure per
    evaluate_test call would retrace — and the test- and train-view sweeps
    at the same iteration share one compiled program this way). Keyed by
    (treedef, leaf values): the treedef carries every static field and
    settings itself is unhashable (scale_modifier is an array leaf)."""
    settings_key = (
        jax.tree.structure(settings),
        tuple(float(x) for x in jax.tree.leaves(settings)),
    )
    if settings_key not in _EVAL_FNS:

        @jax.jit
        def eval_one(camera, params, alive, gt, bg):
            out = render(camera, params, alive, settings, bg)
            img = jnp.clip(out["render"], 0.0, 1.0)
            return losses.l1_loss(img, gt), losses.psnr(img, gt)

        _EVAL_FNS[settings_key] = eval_one
    return _EVAL_FNS[settings_key]


def evaluate_test(state, cameras, settings, bg, use_exposure=False, max_views=None):
    """L1/PSNR over held-out views (`train.py:214-252` training_report)."""
    if max_views:
        cameras = cameras[:max_views]
    if not cameras:
        return None
    params, alive = state.params, state.alive
    try:
        sharded = len(params.xyz.sharding.device_set) > 1
    except AttributeError:
        sharded = False
    if sharded:
        # Evaluate on ONE device: compiling a second multi-device program for
        # the eval sweep makes XLA:CPU's collective rendezvous flaky under
        # host load (observed 6/8 threads arriving -> hard abort), and on
        # real hardware an eval all-gather per view buys nothing either.
        def _to_host(x):
            if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
                # multi-host mesh (gauss_axes=("host","gauss")): np.asarray
                # would raise on a non-fully-addressable array — gather the
                # global value across processes first
                from jax.experimental import multihost_utils

                return jnp.asarray(multihost_utils.process_allgather(x, tiled=True))
            return jnp.asarray(np.asarray(x))

        params = jax.tree.map(_to_host, params)
        alive = _to_host(alive)
    state = state.replace(params=params, alive=alive)
    eval_one = _eval_fn(settings)
    l1s, psnrs = [], []
    for cam in cameras:
        gt = _device_gt(cam)  # cached device upload (tunnel is slow)
        l1, ps = eval_one(cam.camera, state.params, state.alive, gt, bg)
        # keep device scalars; float()-ing here would pay one tunnel round
        # trip per view (dispatch is async, the sweep pipelines without it)
        l1s.append(l1)
        psnrs.append(ps)
    return {
        "l1": float(np.mean(jax.device_get(l1s))),
        "psnr": float(np.mean(jax.device_get(psnrs))),
    }


def train(
    model_cfg: ModelConfig,
    opt: OptimizationConfig,
    pipe: PipelineConfig,
    testing_iterations=(7000, 30000),
    saving_iterations=(7000, 30000),
    checkpoint_iterations=(),
    start_checkpoint: str | None = None,
    quiet: bool = False,
    log_every: int = 10,
    on_iteration=None,
    checkpoint_every: int = 0,
    seed: int = 0,
):
    """Run the full optimization; returns (state, scene, results dict)."""
    scene = Scene(
        model_cfg.source_path,
        model_path=model_cfg.model_path or None,
        images=model_cfg.images,
        depths=model_cfg.depths,
        resolution=model_cfg.resolution,
        white_background=model_cfg.white_background,
        eval=model_cfg.eval,
        train_test_exp=model_cfg.train_test_exp,
    )
    train_cams = scene.get_train_cameras()
    capacity = pipe.capacity or None
    params, alive = init_from_pcd(
        scene.info.points, scene.info.colors,
        max_sh_degree=model_cfg.sh_degree, capacity=capacity,
    )
    state = init_train_state(params, alive, num_images=len(train_cams), seed=seed)
    first_iter = 0
    if start_checkpoint:
        state, first_iter = load_checkpoint(start_checkpoint)
        print(f"Resumed from {start_checkpoint} at iteration {first_iter}")
        # size the instance buffer to the restored model, not the init cloud
        params, alive = state.params, state.alive

    extent = float(scene.cameras_extent)
    xyz_sched = expon_lr_func(
        opt.position_lr_init * extent, opt.position_lr_final * extent,
        lr_delay_mult=opt.position_lr_delay_mult, max_steps=opt.position_lr_max_steps,
    )
    exp_sched = expon_lr_func(
        opt.exposure_lr_init, opt.exposure_lr_final,
        lr_delay_steps=opt.exposure_lr_delay_steps,
        lr_delay_mult=opt.exposure_lr_delay_mult, max_steps=opt.iterations,
    )
    depth_sched = expon_lr_func(
        opt.depth_l1_weight_init, opt.depth_l1_weight_final, max_steps=opt.iterations
    )

    bg_color = jnp.ones(3) if model_cfg.white_background else jnp.zeros(3)
    use_exposure = model_cfg.train_test_exp

    auto_cap = pipe.instance_capacity == 0
    if auto_cap:
        peak = probe_instance_capacity(params, alive, train_cams)
        inst_cap = quantize_capacity(int(1.6 * max(peak, 1)))
        print(f"[auto] instance capacity {inst_cap} (probe peak {peak})")
    else:
        inst_cap = pipe.instance_capacity

    def settings_for(active_sh):
        return make_render_settings(
            sh_degree=active_sh,
            tile=16,
            instance_capacity=inst_cap,
            max_per_tile=pipe.max_per_tile,
            antialiasing=pipe.antialiasing,
            backend=pipe.backend,
            blend_mode=getattr(pipe, "blend_mode", "sorted"),
            packet_dtype=getattr(pipe, "packet_dtype", "float32"),
        )

    mesh = None
    if pipe.mesh:
        from gsplat_tpu.parallel.sharding import (
            make_mesh,
            place_train_state,
            sharded_train_step,
        )

        parts = pipe.mesh.lower().split("x")
        if len(parts) != 2 or not all(p.isdigit() for p in parts):
            raise ValueError(
                f"--mesh must be 'GxT' (e.g. 4x2), got {pipe.mesh!r}"
            )
        g_axis, t_axis = int(parts[0]), int(parts[1])
        mesh = make_mesh(g_axis, t_axis)
        print(f"[mesh] training SPMD over gauss={g_axis} x tile={t_axis} "
              f"({len(jax.devices())} devices)")
        state = place_train_state(mesh, state)

    # Band-bucketed packet exchange sizing (parallel/pipeline.py): auto
    # (-1) probes the scene like the instance buffer; 0 disables (full
    # gather); >0 fixes it. Its own controller grows it on band_overflow.
    exch_cfg = getattr(pipe, "exchange_capacity", -1)
    exch_cap = 0
    exch_ctl = None
    if mesh is not None and mesh.shape["tile"] > 1 and exch_cfg != 0:
        if exch_cfg > 0:
            exch_cap = exch_cfg
        else:
            peak = probe_exchange_capacity(
                params, alive, train_cams, mesh.shape["gauss"],
                mesh.shape["tile"],
            )
            # small floor: band working sets are a fraction of the shard,
            # and an oversized exchange buffer makes the gathered set
            # BIGGER than the full gather it replaces
            exch_cap = quantize_capacity(int(1.6 * max(peak, 1)), floor=4096)
            exch_ctl = CapacityController(exch_cap, floor=4096)
            print(f"[auto] exchange capacity {exch_cap} (probe peak {peak})")

    step_cache = {}

    def step_fn(active_sh, height, width):
        key = (active_sh, inst_cap, exch_cap, height, width)
        if key not in step_cache:
            if mesh is not None:
                # production multi-chip path: the explicit shard_map pipeline
                # (hierarchical all_gather of screen packets whose autodiff
                # transpose is the gradient psum_scatter; the Pallas kernels
                # run per tile shard). Falls back to the GSPMD-annotated step
                # when the tile grid doesn't divide over the tile axis.
                from gsplat_tpu.parallel.pipeline import make_pipeline_train_step

                gy = (height + 15) // 16
                if gy % mesh.shape["tile"] == 0:
                    step_cache[key] = make_pipeline_train_step(
                        mesh, opt, settings_for(active_sh), width, height,
                        use_exposure=use_exposure,
                        exchange_capacity=exch_cap or None,
                    )
                else:
                    step_cache[key], _ = sharded_train_step(
                        mesh, opt, settings_for(active_sh),
                        use_exposure=use_exposure,
                    )
            else:
                step_cache[key] = make_train_step(
                    opt, settings_for(active_sh), use_exposure=use_exposure
                )
        return step_cache[key]

    densify_step = make_densify_step(opt)

    tb = None
    if scene.model_path:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb = SummaryWriter(scene.model_path)
        except Exception:
            print("tensorboard unavailable — progress logs only", file=sys.stderr)

    # seed covers camera pick order, densify child sampling, and any
    # numpy-side draws — the knob the chair seed-variance study turns
    rng = random.Random(seed)
    np_rng = np.random.default_rng(seed)
    # shrink-window spans ~500 iterations regardless of log cadence
    cap_ctl = (
        CapacityController(inst_cap, window=max(1, 500 // max(log_every, 1)))
        if auto_cap
        else None
    )
    # gaussian-axis controller: observed once per densify round (100 iters),
    # so a 10-observation window spans ~1000 iterations. pipe.capacity > 0
    # pins the capacity (no controller), matching the instance-axis knob.
    gauss_ctl = (
        CapacityController(
            state.params.capacity, window=10, event_window=3, floor=4096,
            grow_frac=0.75, grow_margin=1.5, shrink_margin=1.6,
        )
        if not pipe.capacity
        else None
    )
    viewpoint_stack = []
    ema_loss = 0.0
    ema_depth = 0.0
    results = {"test": {}}
    # SH degree ramps once per 1000 iterations; on resume, catch up to where
    # the ramp would be (the reference restores active_sh_degree from the
    # checkpoint tuple, `gaussian_model.py:76,89`)
    active_sh = min(first_iter // 1000, model_cfg.sh_degree)
    t0 = time.time()
    t_iter = time.time()

    for iteration in range(first_iter + 1, opt.iterations + 1):
        # SH degree ramp every 1000 iters (`train.py:93-95`)
        if iteration % 1000 == 0 and active_sh < model_cfg.sh_degree:
            active_sh += 1

        if not viewpoint_stack:
            viewpoint_stack = list(range(len(train_cams)))
        vind = viewpoint_stack.pop(rng.randrange(len(viewpoint_stack)))
        cam = train_cams[vind]

        gt, mask, invd, dmask = _device_batch(cam)
        bg = (
            jnp.asarray(np_rng.random(3), jnp.float32)
            if opt.random_background
            else bg_color
        )
        depth_w = depth_sched(iteration) if cam.depth_reliable else 0.0

        state, metrics = step_fn(active_sh, gt.shape[0], gt.shape[1])(
            state, cam.camera, gt, mask, invd, dmask, bg,
            jnp.float32(xyz_sched(iteration)), jnp.float32(exp_sched(iteration)),
            jnp.float32(depth_w), jnp.int32(cam.uid),
        )

        # Eval BEFORE the densify/reset block, like the reference's
        # training_report (`train.py:158` precedes `:163-174`) — evaluating
        # after an opacity reset reports a meaningless transparent render.
        if iteration in testing_iterations:
            ev = evaluate_test(
                state, scene.get_test_cameras(), settings_for(active_sh), bg_color
            )
            if ev:
                results["test"][iteration] = ev
                print(f"\n[ITER {iteration}] test: L1 {ev['l1']:.5f} PSNR {ev['psnr']:.2f}\n")
                if tb is not None:
                    tb.add_scalar("test/loss_viewpoint - l1_loss", ev["l1"], iteration)
                    tb.add_scalar("test/loss_viewpoint - psnr", ev["psnr"], iteration)
            # a handful of TRAIN views too, like training_report's second
            # config (`train.py:220`: cameras 5,10,...,25 modulo len)
            sel = [train_cams[i % len(train_cams)] for i in range(5, 30, 5)]
            evt = evaluate_test(state, sel, settings_for(active_sh), bg_color)
            if evt:
                results.setdefault("train", {})[iteration] = evt
                print(f"[ITER {iteration}] train: L1 {evt['l1']:.5f} PSNR {evt['psnr']:.2f}\n")
                if tb is not None:
                    tb.add_scalar("train/loss_viewpoint - l1_loss", evt["l1"], iteration)
                    tb.add_scalar("train/loss_viewpoint - psnr", evt["psnr"], iteration)
            if tb is not None:
                # scene/opacity_histogram (`train.py:248-250`; total_points
                # is already written on every log iteration below)
                alive_np = np.asarray(state.alive)
                op = 1.0 / (1.0 + np.exp(-np.asarray(state.params.opacity)[alive_np, 0]))
                tb.add_histogram("scene/opacity_histogram", op, iteration)

        # Densification cadence (`train.py:163-174`)
        if iteration < opt.densify_until_iter:
            if iteration > opt.densify_from_iter and iteration % opt.densification_interval == 0:
                size_threshold = 20 if iteration > opt.opacity_reset_interval else 0
                state, dinfo = densify_step(state, jnp.float32(extent), size_threshold)
                n_pruned, n_alive = int(dinfo["n_pruned"]), int(dinfo["n_alive"])
                if n_pruned * 3 >= n_alive:
                    # mass prune (opacity-reset aftermath): let the
                    # capacity controllers re-evaluate on a short window
                    if cap_ctl is not None:
                        cap_ctl.notify_structural_change()
                    if gauss_ctl is not None:
                        gauss_ctl.notify_structural_change()
                if gauss_ctl is not None:
                    new_gcap = gauss_ctl.update(n_alive, int(dinfo["n_dropped"]))
                    if new_gcap is not None:
                        state = resize_train_state(state, new_gcap)
                        if mesh is not None:
                            state = place_train_state(mesh, state)
                        print(
                            f"[auto] it {iteration}: alive {n_alive} — "
                            f"gaussian capacity -> {new_gcap}"
                        )
                if not quiet and iteration % 1000 == 0:
                    print(
                        f"[densify {iteration}] alive={int(dinfo['n_alive'])} "
                        f"clone={int(dinfo['n_cloned'])} split={int(dinfo['n_split'])} "
                        f"prune={int(dinfo['n_pruned'])} dropped={int(dinfo['n_dropped'])}"
                    )
            if iteration % opt.opacity_reset_interval == 0 or (
                model_cfg.white_background and iteration == opt.densify_from_iter
            ):
                state = opacity_reset_step(state)

        # Sync metrics to host only on log iterations: float()-ing every step
        # would serialize host and device (JAX dispatch is async; the
        # reference hides the same sync behind CUDA stream depth).
        if iteration % max(log_every, 1) == 0:
            loss = float(metrics["loss"])
            ema_loss = 0.4 * loss + 0.6 * ema_loss
            ema_depth = 0.4 * float(metrics["depth_l1"]) + 0.6 * ema_depth
            if tb is not None:
                tb.add_scalar("train_loss_patches/l1_loss", float(metrics["l1"]), iteration)
                tb.add_scalar("train_loss_patches/total_loss", loss, iteration)
                tb.add_scalar("iter_time", (time.time() - t_iter) * 1000.0, iteration)
                tb.add_scalar("total_points", int(state.alive.sum()), iteration)
            if not quiet:
                n_alive = int(state.alive.sum())
                print(
                    f"it {iteration:6d}  loss {ema_loss:.5f}  depth {ema_depth:.5f}  "
                    f"alive {n_alive}  vis {int(metrics['n_visible'])}  "
                    f"({(time.time()-t0):.1f}s)",
                    flush=True,
                )
            overflow = int(metrics["instance_overflow"])
            if auto_cap:
                n_inst = int(metrics["num_instances"])
                new_cap = cap_ctl.update(n_inst, overflow)
                if new_cap is not None:
                    inst_cap = new_cap
                    print(
                        f"[auto] it {iteration}: instances {n_inst} "
                        f"(overflow {overflow}) — capacity -> {inst_cap}"
                    )
            elif overflow > 0:
                print(
                    f"WARNING it {iteration}: instance buffer overflow "
                    f"{overflow} — raise pipe.instance_capacity",
                    file=sys.stderr,
                )
            if exch_ctl is not None:
                new_exch = exch_ctl.update(
                    int(metrics["band_count"]), int(metrics["band_overflow"])
                )
                if new_exch is not None:
                    exch_cap = new_exch
                    print(
                        f"[auto] it {iteration}: band rows "
                        f"{int(metrics['band_count'])} (overflow "
                        f"{int(metrics['band_overflow'])}) — exchange "
                        f"capacity -> {exch_cap}"
                    )
            elif exch_cap and int(metrics["band_overflow"]) > 0:
                print(
                    f"WARNING it {iteration}: band exchange overflow "
                    f"{int(metrics['band_overflow'])} — raise "
                    f"pipe.exchange_capacity",
                    file=sys.stderr,
                )
        t_iter = time.time()

        if iteration in saving_iterations and scene.model_path:
            print(f"\n[ITER {iteration}] Saving Gaussians")
            scene.save(
                iteration, state.params, state.alive, state.exposure,
                [c.image_name for c in train_cams],
            )
        if iteration in checkpoint_iterations and scene.model_path:
            print(f"\n[ITER {iteration}] Saving Checkpoint")
            save_checkpoint(
                os.path.join(scene.model_path, f"chkpnt{iteration}.pkl"), state, iteration
            )
        if (
            checkpoint_every
            and iteration % checkpoint_every == 0
            and scene.model_path
        ):
            # rolling checkpoint for stall/crash recovery (overwritten in
            # place; `scripts/train_supervised.py` resumes from it)
            save_checkpoint_async(
                os.path.join(scene.model_path, "rolling_chkpnt.pkl"), state, iteration
            )
        if on_iteration is not None:
            on_iteration(iteration, state, metrics)

    _ckpt_flush()
    if tb is not None:
        tb.close()
    results["wall_s"] = time.time() - t0
    results["instance_capacity"] = inst_cap
    return state, scene, results
