"""Gaussian-axis capacity resize of the training state.

The reference reallocates its parameter/optimizer tensors every densify
round (`scene/gaussian_model.py:316-386`, cat/index_select). Under jit the
row count is a compiled shape, so the TPU-native equivalent is a RARE
host-level resize to a new static capacity (quantized on the capacity
ladder, `gsplat_tpu/capacity.py`), after which every jitted program simply
retraces at the new shape:

- GROW: pad every per-gaussian array with dead rows.
- SHRINK: compact alive rows to the front (stable, so relative row order —
  and nothing else — changes; no external state keys on row ids), then
  truncate. Adam moments, per-row step counts, and densification stats
  travel with their rows.

Measured motivation: a lego train step at 8x gaussian padding costs ~2x a
tightly-sized one (102.6 vs 50.8 ms/step), and padding multiplies further
with instance-capacity padding (434.8 ms at 8x gauss + 3x instance).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsplat_tpu.train.densify import sanitize_dead_rows


def _per_gaussian_arrays(state):
    """The TrainState fields padded on the gaussian axis."""
    return {
        "params": state.params,
        "alive": state.alive,
        "adam_m": state.adam_m,
        "adam_v": state.adam_v,
        "adam_counts": state.adam_counts,
        "stats": state.stats,
    }


def _pad_leaf(leaf, new_c):
    pad = new_c - leaf.shape[0]
    return jnp.concatenate(
        [leaf, jnp.zeros((pad,) + leaf.shape[1:], leaf.dtype)], axis=0
    )


def _grow(tree, new_c):
    return jax.tree.map(lambda l: _pad_leaf(l, new_c), tree)


def _compact_truncate(tree, alive, new_c):
    # alive-first stable permutation: argsort of the dead mask keeps the
    # relative order of alive rows (and of dead rows) unchanged
    perm = jnp.argsort(~alive, stable=True)[:new_c]
    return jax.tree.map(lambda l: l[perm], tree)


def resize_train_state(state, new_capacity: int):
    """Return `state` with every per-gaussian array resized to new_capacity.

    Shrinking compacts alive rows first; the caller must ensure the alive
    count fits (the capacity controller's shrink margin guarantees it —
    checked here anyway because a silent row drop corrupts training).
    """
    c = state.params.capacity
    new_capacity = int(new_capacity)
    if new_capacity == c:
        return state
    tree = _per_gaussian_arrays(state)
    if new_capacity > c:
        tree = _grow(tree, new_capacity)
    else:
        n_alive = int(jax.device_get(state.alive.sum()))
        if n_alive > new_capacity:
            raise ValueError(
                f"cannot shrink capacity to {new_capacity}: {n_alive} rows alive"
            )
        tree = _compact_truncate(tree, state.alive, new_capacity)
    params = sanitize_dead_rows(tree["params"], tree["alive"])
    return state.replace(
        params=params,
        alive=tree["alive"],
        adam_m=tree["adam_m"],
        adam_v=tree["adam_v"],
        adam_counts=tree["adam_counts"],
        stats=tree["stats"],
    )
