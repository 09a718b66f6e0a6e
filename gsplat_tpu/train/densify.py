"""Densification (clone / split / prune) as static-capacity masked updates.

The reference grows and shrinks its parameter tensors every 100 iterations by
rebuilding them (and the Adam state) with cat/index_select
(`scene/gaussian_model.py:316-469`). XLA cannot reshape a jitted program, so
the TPU-native design keeps a fixed `capacity` and an `alive` mask:

- prune      -> clear alive bits (params of dead rows are sanitized)
- clone      -> copy a row into a free slot
- split      -> sample two children into free slots, kill the parent

Slot allocation is scatter-light: ranks come from prefix sums and the single
scatter is the children write. Semantics match the reference order (clone +
split from the same pre-round stats, then opacity/size prune — fused here by
pruning parents first, which yields the same surviving set):

- clone mask:  grad >= thr and max(scale) <= percent_dense * extent
  (`gaussian_model.py:435-450`)
- split mask:  grad >= thr and max(scale) >  percent_dense * extent; children
  sampled from N(0, diag(scale)) rotated into world, scales /(0.8*2)
  (`gaussian_model.py:409-433`)
- prune mask:  opacity < min_opacity, or (after an opacity reset has
  happened) screen radius > 20 px or world extent > 0.1 * scene extent
  (`gaussian_model.py:452-469`)
- densification stats and Adam moments of new rows zeroed; stats fully reset
  each round (`gaussian_model.py:386-407` densification_postfix)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsplat_tpu.core import activations as act
from gsplat_tpu.core.types import GaussianParams

DEAD_PARAMS = dict(scaling=-15.0, opacity=-15.0)


def sanitize_dead_rows(params: GaussianParams, alive) -> GaussianParams:
    """Force dead rows to inert values (tiny scale, ~0 opacity, identity quat)
    so leaked rows cannot affect renders or produce NaNs."""
    dead = ~alive
    return params.replace(
        scaling=jnp.where(dead[:, None], DEAD_PARAMS["scaling"], params.scaling),
        opacity=jnp.where(dead[:, None], DEAD_PARAMS["opacity"], params.opacity),
        rotation=jnp.where(dead[:, None], jnp.array([1.0, 0.0, 0.0, 0.0]), params.rotation),
    )


def accumulate_stats(stats, screen_grad_norm, visibility, radii):
    """Per-iteration bookkeeping (`train.py:166-167`,`gaussian_model.py:471-473`).

    Args:
      stats: dict with grad_accum (N,), denom (N,), max_radii2d (N,) int32.
      screen_grad_norm: (N,) ||dL/d mean2d||_2 in the reference's NDC-ish
        scale (pixel-grad * [0.5*W, 0.5*H]).
      visibility: (N,) bool (radii > 0).
      radii: (N,) int32.
    """
    vis = visibility
    return {
        "grad_accum": stats["grad_accum"] + jnp.where(vis, screen_grad_norm, 0.0),
        "denom": stats["denom"] + vis.astype(jnp.float32),
        "max_radii2d": jnp.where(
            vis, jnp.maximum(stats["max_radii2d"], radii), stats["max_radii2d"]
        ),
    }


def zero_stats(capacity: int):
    return {
        "grad_accum": jnp.zeros((capacity,), jnp.float32),
        "denom": jnp.zeros((capacity,), jnp.float32),
        "max_radii2d": jnp.zeros((capacity,), jnp.int32),
    }


def _rank_to_slot(free):
    """(C,) bool -> (C,) int32 mapping free-rank k -> slot index (extra ranks
    map to an out-of-range sentinel handled by callers via drop masks)."""
    c = free.shape[0]
    rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank of each free slot
    slot_for_rank = jnp.full((c,), c, jnp.int32)
    # non-free slots write out-of-bounds (index c) and are dropped
    return slot_for_rank.at[jnp.where(free, rank, c)].set(
        jnp.arange(c, dtype=jnp.int32), mode="drop"
    )


def densify_and_prune(
    params: GaussianParams,
    alive,
    adam_m: GaussianParams,
    adam_v: GaussianParams,
    adam_counts,
    stats: dict,
    key,
    grad_threshold: float,
    min_opacity: float,
    extent,
    max_screen_size,  # 0 disables the size prune (reference passes None)
    percent_dense: float = 0.01,
):
    """One densification round. Returns (params, alive, m, v, counts, stats, info)."""
    c = params.capacity
    grads = stats["grad_accum"] / jnp.maximum(stats["denom"], 1.0)
    grads = jnp.where(stats["denom"] > 0, grads, 0.0)

    scales = act.scaling_activation(params.scaling)
    max_scale = scales.max(axis=-1)
    opacity = act.opacity_activation(params.opacity)[:, 0]

    prune = opacity < min_opacity
    if max_screen_size:
        # NOTE: the reference's screen-size prune (`big_points_vs`,
        # `gaussian_model.py:462`) reads `self.max_radii2D` AFTER
        # `densification_postfix` has zeroed it (`gaussian_model.py:408`), so
        # it is dead code upstream: only the world-size prune is live.
        # Matching the intended (radii > 20px) semantics instead executes
        # every large splat each round and collapses training — measured on
        # lego: post-reset mass prune 78k -> 30k, loss stuck 3.5x higher.
        prune = prune | (max_scale > 0.1 * extent)
    prune = prune & alive

    hot = alive & ~prune & (grads >= grad_threshold)
    clone_mask = hot & (max_scale <= percent_dense * extent)
    split_mask = hot & (max_scale > percent_dense * extent)

    keep = alive & ~prune & ~split_mask

    # --- children: channel 0 = clone copy or split child A; channel 1 = split child B
    parent_active = jnp.stack([clone_mask | split_mask, split_mask])  # (2, C)
    flat_active = parent_active.reshape(-1)
    req_rank = jnp.cumsum(flat_active.astype(jnp.int32)) - 1  # (2C,)

    free = ~keep
    num_free = free.astype(jnp.int32).sum()
    slot_for_rank = _rank_to_slot(free)  # (C,)

    placed = flat_active & (req_rank < num_free)
    target = jnp.where(placed, slot_for_rank[jnp.minimum(req_rank, c - 1)], c)  # (2C,)
    dropped = (flat_active & ~placed).astype(jnp.int32).sum()

    # --- child parameters
    key_a, key_b = jax.random.split(key)
    R = act.quat_to_rotmat(params.rotation)  # (C, 3, 3)

    def split_xyz(k):
        samples = jax.random.normal(k, (c, 3)) * scales  # N(0, diag(S))
        return params.xyz + jnp.einsum("nij,nj->ni", R, samples,
                                       precision=jax.lax.Precision.HIGHEST)

    split_scaling = act.scaling_inverse_activation(scales / (0.8 * 2.0))

    is_split = split_mask  # clone children keep parent params verbatim
    child_a = params.replace(
        xyz=jnp.where(is_split[:, None], split_xyz(key_a), params.xyz),
        scaling=jnp.where(is_split[:, None], split_scaling, params.scaling),
    )
    child_b = params.replace(
        xyz=split_xyz(key_b),
        scaling=split_scaling,
    )

    # --- scatter children into their slots (drops write to row `c`, OOB)
    def scatter_children(base_leaf, ca_leaf, cb_leaf):
        src = jnp.concatenate([ca_leaf, cb_leaf], axis=0)  # (2C, ...)
        return base_leaf.at[target].set(src, mode="drop")

    new_params = jax.tree.map(
        lambda b, a2, b2: scatter_children(b, a2, b2), params, child_a, child_b
    )
    new_alive = keep.at[target].set(True, mode="drop")

    # --- fresh Adam state + stats for new rows (`cat_tensors_to_optimizer`)
    zeros2c = lambda leaf: jnp.zeros((2 * c,) + leaf.shape[1:], leaf.dtype)
    new_m = jax.tree.map(lambda l: l.at[target].set(zeros2c(l), mode="drop"), adam_m)
    new_v = jax.tree.map(lambda l: l.at[target].set(zeros2c(l), mode="drop"), adam_v)
    new_counts = adam_counts.at[target].set(jnp.zeros((2 * c,), adam_counts.dtype), mode="drop")

    # dead rows: zero moments so nothing stale survives slot reuse
    new_m = jax.tree.map(lambda l: jnp.where(_rows(new_alive, l), l, 0.0), new_m)
    new_v = jax.tree.map(lambda l: jnp.where(_rows(new_alive, l), l, 0.0), new_v)
    new_params = sanitize_dead_rows(new_params, new_alive)

    info = {
        "n_cloned": clone_mask.astype(jnp.int32).sum(),
        "n_split": split_mask.astype(jnp.int32).sum(),
        "n_pruned": prune.astype(jnp.int32).sum(),
        "n_dropped": dropped,  # children lost to capacity exhaustion
        "n_alive": new_alive.astype(jnp.int32).sum(),
    }
    return new_params, new_alive, new_m, new_v, new_counts, zero_stats(c), info


def _rows(mask, leaf):
    return mask.reshape(mask.shape[:1] + (1,) * (leaf.ndim - 1))


def reset_opacity(params: GaussianParams, alive, adam_m, adam_v):
    """Clamp opacity to <= 0.01 and reset its Adam moments
    (`gaussian_model.py:258-261` + replace_tensor_to_optimizer)."""
    new_op = act.inverse_sigmoid(
        jnp.minimum(act.opacity_activation(params.opacity), 0.01)
    )
    new_op = jnp.where(alive[:, None], new_op, DEAD_PARAMS["opacity"])
    return (
        params.replace(opacity=new_op),
        adam_m.replace(opacity=jnp.zeros_like(adam_m.opacity)),
        adam_v.replace(opacity=jnp.zeros_like(adam_v.opacity)),
    )
