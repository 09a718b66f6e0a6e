"""Masked/pytree Adam vs torch.optim.Adam (the reference's optimizer)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gsplat_tpu.core.types import GaussianParams
from gsplat_tpu.train.optim import adam_update, adam_update_dense, make_lr_tree


def rand_params(rng, n=64):
    return GaussianParams(
        xyz=jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)),
        features_dc=jnp.asarray(rng.standard_normal((n, 1, 3)).astype(np.float32)),
        features_rest=jnp.asarray(rng.standard_normal((n, 15, 3)).astype(np.float32)),
        scaling=jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32)),
        rotation=jnp.asarray(rng.standard_normal((n, 4)).astype(np.float32)),
        opacity=jnp.asarray(rng.standard_normal((n, 1)).astype(np.float32)),
    )


def test_adam_matches_torch(rng):
    n = 32
    params = rand_params(rng, n)
    lr_tree = make_lr_tree(1e-3, 2.5e-3, 0.025, 5e-3, 1e-3)

    t_params = {
        k: torch.tensor(np.asarray(getattr(params, k)), requires_grad=True)
        for k in ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity")
    }
    t_lrs = {
        "xyz": 1e-3, "features_dc": 2.5e-3, "features_rest": 2.5e-3 / 20,
        "opacity": 0.025, "scaling": 5e-3, "rotation": 1e-3,
    }
    topt = torch.optim.Adam(
        [{"params": [t_params[k]], "lr": t_lrs[k]} for k in t_params], lr=0.0, eps=1e-15
    )

    m = jax.tree.map(jnp.zeros_like, params)
    v = jax.tree.map(jnp.zeros_like, params)
    counts = jnp.zeros((n,), jnp.int32)

    for step in range(5):
        grads_np = {
            k: rng.standard_normal(np.asarray(getattr(params, k)).shape).astype(np.float32)
            for k in t_params
        }
        grads = GaussianParams(**{k: jnp.asarray(g) for k, g in grads_np.items()})
        params, m, v, counts = adam_update(params, grads, m, v, counts, lr_tree)
        for k in t_params:
            t_params[k].grad = torch.tensor(grads_np[k])
        topt.step()

    for k in t_params:
        np.testing.assert_allclose(
            np.asarray(getattr(params, k)), t_params[k].detach().numpy(), atol=1e-5,
            err_msg=k,
        )


def test_sparse_adam_only_touches_visible(rng):
    n = 16
    params = rand_params(rng, n)
    lr_tree = make_lr_tree(1e-2, 1e-2, 1e-2, 1e-2, 1e-2)
    m = jax.tree.map(jnp.zeros_like, params)
    v = jax.tree.map(jnp.zeros_like, params)
    counts = jnp.zeros((n,), jnp.int32)
    vis = jnp.asarray(rng.random(n) < 0.5)
    grads = jax.tree.map(jnp.ones_like, params)
    new_params, new_m, new_v, new_counts = adam_update(
        params, grads, m, v, counts, lr_tree, visibility=vis
    )
    moved = np.any(np.asarray(new_params.xyz) != np.asarray(params.xyz), axis=-1)
    np.testing.assert_array_equal(moved, np.asarray(vis))
    np.testing.assert_array_equal(np.asarray(new_counts), np.asarray(vis).astype(np.int32))
    # invisible rows keep zero moments
    assert np.all(np.asarray(new_m.xyz)[~np.asarray(vis)] == 0)


def test_dense_adam_single_tensor_matches_torch(rng):
    x = rng.standard_normal((4, 3, 4)).astype(np.float32)
    tx = torch.tensor(x, requires_grad=True)
    topt = torch.optim.Adam([tx], lr=0.01)
    p = jnp.asarray(x)
    m = jnp.zeros_like(p)
    v = jnp.zeros_like(p)
    step = jnp.zeros((), jnp.int32)
    for _ in range(4):
        g = rng.standard_normal(x.shape).astype(np.float32)
        p, m, v, step = adam_update_dense(p, jnp.asarray(g), m, v, step, 0.01)
        tx.grad = torch.tensor(g)
        topt.step()
    np.testing.assert_allclose(np.asarray(p), tx.detach().numpy(), atol=1e-6)
