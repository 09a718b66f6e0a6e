"""Fully-jitted training step + training state pytree.

One call = the reference's per-iteration device work (`train.py:91-186`):
render, alpha-mask, L1+SSIM (+weighted depth-L1), backward, densification
stats accumulation, exposure Adam step, parameter Adam step (dense or
sparse). The host loop around it only does camera sampling, LR schedules,
and the every-N-iters densify / opacity-reset calls (which are themselves
jitted functions on the same state pytree).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gsplat_tpu.config import OptimizationConfig
from gsplat_tpu.core.types import Camera, GaussianParams, RenderSettings, pytree_dataclass
from gsplat_tpu.model import init_exposure
from gsplat_tpu.render import render
from gsplat_tpu.train import losses
from gsplat_tpu.train.densify import (
    densify_and_prune,
    reset_opacity,
    zero_stats,
)
from gsplat_tpu.train.optim import adam_update, adam_update_dense, make_lr_tree


@pytree_dataclass
class TrainState:
    params: GaussianParams
    alive: jax.Array  # (C,) bool
    adam_m: GaussianParams
    adam_v: GaussianParams
    adam_counts: jax.Array  # (C,) int32 per-row step counts
    exposure: jax.Array  # (M, 3, 4)
    exp_m: jax.Array
    exp_v: jax.Array
    exp_step: jax.Array  # () int32
    stats: dict  # grad_accum / denom / max_radii2d
    rng: jax.Array  # PRNG key
    step: jax.Array  # () int32 global iteration


def init_train_state(params: GaussianParams, alive, num_images: int, seed: int = 0) -> TrainState:
    zeros_like_params = jax.tree.map(jnp.zeros_like, params)
    exposure = init_exposure(num_images)
    return TrainState(
        params=params,
        alive=alive,
        adam_m=zeros_like_params,
        adam_v=jax.tree.map(jnp.zeros_like, params),
        adam_counts=jnp.zeros((params.capacity,), jnp.int32),
        exposure=exposure,
        exp_m=jnp.zeros_like(exposure),
        exp_v=jnp.zeros_like(exposure),
        exp_step=jnp.zeros((), jnp.int32),
        stats=zero_stats(params.capacity),
        rng=jax.random.PRNGKey(seed),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    opt: OptimizationConfig,
    settings: RenderSettings,
    use_exposure: bool = False,
    render_fn=None,
):
    """Build the jitted train step for a given static config.

    The returned function:
      step(state, camera, gt_image, alpha_mask, invdepth_gt, depth_mask, bg,
           xyz_lr, exposure_lr, depth_weight, exposure_index)
        -> (new_state, metrics dict)

    `invdepth_gt`/`depth_mask` are always passed (zeros when absent) with
    `depth_weight` scalar 0 gating them — one compiled program for all views.

    `render_fn(camera, params, alive, bg, mean2d_offset=, exposure=)` lets a
    multi-chip pipeline (parallel/pipeline.py) replace the single-device
    renderer while keeping every other step semantic identical.
    """
    sparse = opt.optimizer_type == "sparse_adam"

    if render_fn is None:
        def render_fn(camera, params, alive, bg, mean2d_offset=None, exposure=None):
            return render(
                camera, params, alive, settings, bg,
                mean2d_offset=mean2d_offset, exposure=exposure,
            )

    def loss_fn(diff, state, camera, gt_image, alpha_mask, invdepth_gt, depth_mask, bg, depth_weight, exposure_index):
        params, exposure, mean2d_offset = diff
        exp_mat = exposure[exposure_index] if use_exposure else None
        out = render_fn(
            camera, params, state.alive, bg,
            mean2d_offset=mean2d_offset, exposure=exp_mat,
        )
        image = out["render"] * alpha_mask
        loss, ll1 = losses.photometric_loss(image, gt_image, opt.lambda_dssim)
        dl1 = losses.depth_l1_loss(out["invdepth"], invdepth_gt, depth_mask)
        loss = loss + depth_weight * dl1
        return loss, (out, ll1, dl1)

    @jax.jit
    def train_step(
        state: TrainState,
        camera: Camera,
        gt_image,
        alpha_mask,
        invdepth_gt,
        depth_mask,
        bg,
        xyz_lr,
        exposure_lr,
        depth_weight,
        exposure_index,
    ):
        mean2d_offset = jnp.zeros((state.params.capacity, 2), jnp.float32)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (out, ll1, dl1)), grads = grad_fn(
            (state.params, state.exposure, mean2d_offset),
            state, camera, gt_image, alpha_mask, invdepth_gt, depth_mask,
            bg, depth_weight, exposure_index,
        )
        param_grads, exp_grads, screen_grads = grads

        # densification stats: reference accumulates ||dL/dmean2D||_2 in its
        # NDC-ish scaling = pixel-grad * (0.5*W, 0.5*H) (`backward.cu:626-627`,
        # `gaussian_model.py:471-473`)
        scale_vec = jnp.array([0.5 * camera.width, 0.5 * camera.height], jnp.float32)
        screen_grad_norm = jnp.linalg.norm(screen_grads * scale_vec, axis=-1)
        visibility = out["visibility"]
        stats = {
            "grad_accum": state.stats["grad_accum"]
            + jnp.where(visibility, screen_grad_norm, 0.0),
            "denom": state.stats["denom"] + visibility.astype(jnp.float32),
            "max_radii2d": jnp.where(
                visibility,
                jnp.maximum(state.stats["max_radii2d"], out["radii"]),
                state.stats["max_radii2d"],
            ),
        }

        lr_tree = make_lr_tree(
            xyz_lr, opt.feature_lr, opt.opacity_lr, opt.scaling_lr, opt.rotation_lr
        )
        vis_mask = visibility if sparse else None
        new_params, new_m, new_v, new_counts = adam_update(
            state.params, param_grads, state.adam_m, state.adam_v,
            state.adam_counts, lr_tree, visibility=vis_mask,
        )
        # dead rows must not drift (grads there are zero, but keep it airtight)
        row = lambda l: state.alive.reshape((-1,) + (1,) * (l.ndim - 1))
        new_params = jax.tree.map(
            lambda new, old: jnp.where(row(new), new, old), new_params, state.params
        )

        if use_exposure:
            new_exp, exp_m, exp_v, exp_step = adam_update_dense(
                state.exposure, exp_grads, state.exp_m, state.exp_v,
                state.exp_step, exposure_lr,
            )
        else:
            new_exp, exp_m, exp_v, exp_step = (
                state.exposure, state.exp_m, state.exp_v, state.exp_step
            )

        new_state = state.replace(
            params=new_params,
            adam_m=new_m,
            adam_v=new_v,
            adam_counts=new_counts,
            exposure=new_exp,
            exp_m=exp_m,
            exp_v=exp_v,
            exp_step=exp_step,
            stats=stats,
            step=state.step + 1,
        )
        metrics = {
            "loss": loss,
            "l1": ll1,
            "depth_l1": dl1,
            "num_instances": out["num_instances"],
            "instance_overflow": out["instance_overflow"],
            "tile_overflow": out["tile_overflow"],
            # band-exchange health; 0 on the single-device / full-gather
            # paths (see parallel/pipeline.py)
            "band_overflow": out.get("band_overflow", jnp.int32(0)),
            "band_count": out.get("band_count", jnp.int32(0)),
            "n_visible": visibility.astype(jnp.int32).sum(),
        }
        return new_state, metrics

    return train_step


def make_densify_step(opt: OptimizationConfig):
    """Jitted densify/prune on the TrainState (host decides *when* to call)."""

    @partial(jax.jit, static_argnames=("max_screen_size",))
    def densify_step(state: TrainState, extent, max_screen_size):
        key, sub = jax.random.split(state.rng)
        params, alive, m, v, counts, stats, info = densify_and_prune(
            state.params, state.alive, state.adam_m, state.adam_v,
            state.adam_counts, state.stats, sub,
            opt.densify_grad_threshold, 0.005, extent, max_screen_size,
            opt.percent_dense,
        )
        return state.replace(
            params=params, alive=alive, adam_m=m, adam_v=v,
            adam_counts=counts, stats=stats, rng=key,
        ), info

    return densify_step


@jax.jit
def opacity_reset_step(state: TrainState):
    params, m, v = reset_opacity(state.params, state.alive, state.adam_m, state.adam_v)
    return state.replace(params=params, adam_m=m, adam_v=v)
