"""Adam for the Gaussian parameter pytree, with per-group LRs and sparse mode.

The reference runs one torch Adam over six param groups with eps=1e-15 and an
exponentially-decayed xyz LR (`scene/gaussian_model.py:183-201`), plus the
optional SparseGaussianAdam that only touches rows visible in the current view
(`train.py:178-183`). Here both are one functional masked-Adam update on the
pytree: `visibility=None` is dense Adam; passing the per-row visibility mask
gives sparse-adam semantics (invisible rows keep params AND moments AND their
effective step count unchanged — moments don't decay while unobserved).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsplat_tpu.core.types import GaussianParams

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-15  # reference eps (`gaussian_model.py:193`)


def make_lr_tree(xyz_lr, feature_lr, opacity_lr, scaling_lr, rotation_lr) -> GaussianParams:
    """Per-leaf learning rates matching the reference groups
    (`gaussian_model.py:183-190`); f_rest trains at feature_lr/20."""
    return GaussianParams(
        xyz=jnp.asarray(xyz_lr, jnp.float32),
        features_dc=jnp.asarray(feature_lr, jnp.float32),
        features_rest=jnp.asarray(feature_lr, jnp.float32) / 20.0,
        scaling=jnp.asarray(scaling_lr, jnp.float32),
        rotation=jnp.asarray(rotation_lr, jnp.float32),
        opacity=jnp.asarray(opacity_lr, jnp.float32),
    )


def _broadcast_rows(mask, leaf):
    return mask.reshape(mask.shape[:1] + (1,) * (leaf.ndim - 1))


def adam_update(params, grads, m, v, counts, lr_tree, visibility=None, eps=ADAM_EPS):
    """One (optionally row-masked) Adam step over matching pytrees.

    Args:
      params, grads, m, v: matching pytrees; leaves (N, ...).
      counts: per-row int32 step counts (N,) — drives bias correction. For
        dense Adam every row's count advances each call; for sparse Adam only
        visible rows advance (torch's SparseAdam-style per-row `state['step']`).
      lr_tree: pytree of scalar LRs (same structure).
      visibility: optional (N,) bool; rows outside it are left untouched.

    Returns:
      (new_params, new_m, new_v, new_counts).
    """
    if visibility is None:
        new_counts = counts + 1
    else:
        new_counts = counts + visibility.astype(counts.dtype)

    t = new_counts.astype(jnp.float32)
    bc1 = 1.0 - ADAM_B1**t  # (N,)
    bc2 = 1.0 - ADAM_B2**t

    def leaf_update(p, g, m_, v_, lr):
        m_new = ADAM_B1 * m_ + (1.0 - ADAM_B1) * g
        v_new = ADAM_B2 * v_ + (1.0 - ADAM_B2) * g * g
        mb = m_new / _broadcast_rows(bc1, m_new)
        vb = v_new / _broadcast_rows(bc2, v_new)
        p_new = p - lr * mb / (jnp.sqrt(vb) + eps)
        if visibility is not None:
            row = _broadcast_rows(visibility, p)
            p_new = jnp.where(row, p_new, p)
            m_new = jnp.where(row, m_new, m_)
            v_new = jnp.where(row, v_new, v_)
        return p_new, m_new, v_new

    out = jax.tree.map(leaf_update, params, grads, m, v, lr_tree)
    leaves, treedef = jax.tree.flatten(out, is_leaf=lambda x: isinstance(x, tuple))
    new_p = jax.tree.unflatten(treedef, [l[0] for l in leaves])
    new_m = jax.tree.unflatten(treedef, [l[1] for l in leaves])
    new_v = jax.tree.unflatten(treedef, [l[2] for l in leaves])
    return new_p, new_m, new_v, new_counts


def adam_update_dense(param, grad, m, v, step, lr, eps=1e-8):
    """Plain dense Adam on a single tensor with a scalar step (used for the
    exposure affines, reference `gaussian_model.py:201` torch defaults)."""
    step = step + 1
    m_new = ADAM_B1 * m + (1.0 - ADAM_B1) * grad
    v_new = ADAM_B2 * v + (1.0 - ADAM_B2) * grad * grad
    t = step.astype(jnp.float32)
    mb = m_new / (1.0 - ADAM_B1**t)
    vb = v_new / (1.0 - ADAM_B2**t)
    return param - lr * mb / (jnp.sqrt(vb) + eps), m_new, v_new, step
