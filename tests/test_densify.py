"""Densification (static-capacity masked clone/split/prune) unit tests.

Mirrors the semantics of the reference's tensor-surgery implementation
(`scene/gaussian_model.py:409-469`) on hand-built states where the expected
clone/split/prune sets are known."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu.core import activations as act
from gsplat_tpu.core.types import GaussianParams
from gsplat_tpu.train.densify import densify_and_prune, reset_opacity, zero_stats


def make_state(n_alive, capacity, rng, scale=0.01):
    c = capacity
    params = GaussianParams(
        xyz=jnp.asarray(rng.standard_normal((c, 3)).astype(np.float32)),
        features_dc=jnp.asarray(rng.standard_normal((c, 1, 3)).astype(np.float32)),
        features_rest=jnp.zeros((c, 15, 3), jnp.float32),
        scaling=jnp.full((c, 3), np.log(scale), jnp.float32),
        rotation=jnp.asarray(
            np.tile(np.array([1, 0, 0, 0], np.float32), (c, 1))
        ),
        opacity=jnp.full((c, 1), 2.0, jnp.float32),  # sigmoid(2) ~ 0.88
    )
    alive = jnp.arange(c) < n_alive
    m = jax.tree.map(jnp.zeros_like, params)
    v = jax.tree.map(jnp.zeros_like, params)
    counts = jnp.zeros((c,), jnp.int32)
    return params, alive, m, v, counts


def run(params, alive, m, v, counts, stats, **kw):
    kwargs = dict(
        grad_threshold=0.0002, min_opacity=0.005, extent=1.0,
        max_screen_size=0, percent_dense=0.01,
    )
    kwargs.update(kw)
    return densify_and_prune(
        params, alive, m, v, counts, stats, jax.random.PRNGKey(0), **kwargs
    )


def test_clone_copies_small_high_grad(rng):
    c = 64
    params, alive, m, v, counts = make_state(8, c, rng, scale=0.001)  # small -> clone
    stats = zero_stats(c)
    stats["grad_accum"] = stats["grad_accum"].at[:4].set(1.0)  # rows 0-3 hot
    stats["denom"] = stats["denom"].at[:8].set(1.0)
    p2, a2, m2, v2, cnt2, stats2, info = run(params, alive, m, v, counts, stats)
    assert int(info["n_cloned"]) == 4
    assert int(info["n_split"]) == 0
    assert int(info["n_pruned"]) == 0
    assert int(a2.sum()) == 12
    # each hot row's xyz appears twice now
    xyz = np.asarray(p2.xyz)[np.asarray(a2)]
    for i in range(4):
        matches = (np.abs(xyz - np.asarray(params.xyz)[i]) < 1e-6).all(axis=-1).sum()
        assert matches == 2
    assert np.all(np.asarray(stats2["grad_accum"]) == 0)  # stats reset


def test_split_samples_and_kills_parent(rng):
    c = 64
    params, alive, m, v, counts = make_state(8, c, rng, scale=0.5)  # big -> split
    stats = zero_stats(c)
    stats["grad_accum"] = stats["grad_accum"].at[:2].set(1.0)
    stats["denom"] = stats["denom"].at[:8].set(1.0)
    p2, a2, m2, v2, cnt2, stats2, info = run(params, alive, m, v, counts, stats)
    assert int(info["n_split"]) == 2
    assert int(a2.sum()) == 8 - 2 + 4  # parents die, 2 children each
    # parents' slots are freed and may be reused by children; what must hold:
    # exactly 4 alive rows carry the shrunk scale 0.5/1.6, the 6 non-split
    # originals keep scale 0.5
    scales = np.exp(np.asarray(p2.scaling))[np.asarray(a2)][:, 0]
    assert (np.abs(scales - 0.5 / 1.6) < 1e-5).sum() == 4
    assert (np.abs(scales - 0.5) < 1e-5).sum() == 6


def test_prune_low_opacity(rng):
    c = 32
    params, alive, m, v, counts = make_state(10, c, rng)
    params = params.replace(
        opacity=params.opacity.at[3].set(-8.0).at[7].set(-8.0)  # sigmoid ~ 3e-4
    )
    stats = zero_stats(c)
    p2, a2, *_, info = run(params, alive, m, v, counts, stats)
    assert int(info["n_pruned"]) == 2
    assert int(a2.sum()) == 8
    assert not np.asarray(a2)[3] and not np.asarray(a2)[7]


def test_size_prune_with_screen_threshold(rng):
    """World-size prune is live when max_screen_size is set; the screen-radius
    prune must NOT fire — the reference's `big_points_vs` reads max_radii2D
    after densification_postfix zeroed it (`gaussian_model.py:408,462`), so it
    is dead code upstream and pruning on it collapses training."""
    c = 32
    params, alive, m, v, counts = make_state(6, c, rng, scale=0.01)
    stats = zero_stats(c)
    stats["max_radii2d"] = stats["max_radii2d"].at[2].set(50)  # big on screen
    params = params.replace(scaling=params.scaling.at[4].set(np.log(0.5)))  # big in world
    p2, a2, *_, info = run(params, alive, m, v, counts, stats, max_screen_size=20)
    assert np.asarray(a2)[2]  # screen-size alone must not prune
    assert not np.asarray(a2)[4]
    assert int(a2.sum()) == 5


def test_capacity_exhaustion_reports_dropped(rng):
    c = 10
    params, alive, m, v, counts = make_state(9, c, rng, scale=0.001)
    stats = zero_stats(c)
    stats["grad_accum"] = stats["grad_accum"].at[:9].set(1.0)  # all want to clone
    stats["denom"] = stats["denom"].at[:9].set(1.0)
    p2, a2, *_, info = run(params, alive, m, v, counts, stats)
    assert int(info["n_dropped"]) == 8  # only 1 free slot
    assert int(a2.sum()) == 10


def test_adam_state_reset_for_children(rng):
    c = 32
    params, alive, m, v, counts = make_state(4, c, rng, scale=0.001)
    m = jax.tree.map(lambda l: l + 1.0, m)  # nonzero moments everywhere
    counts = counts + 5
    stats = zero_stats(c)
    stats["grad_accum"] = stats["grad_accum"].at[:2].set(1.0)
    stats["denom"] = stats["denom"].at[:2].set(1.0)
    p2, a2, m2, v2, cnt2, *_ = run(params, alive, m, v, counts, stats)
    new_rows = np.asarray(a2) & ~(np.arange(c) < 4)
    assert new_rows.sum() == 2
    assert np.all(np.asarray(m2.xyz)[new_rows] == 0)
    assert np.all(np.asarray(cnt2)[new_rows] == 0)
    # surviving originals keep their moments
    assert np.all(np.asarray(m2.xyz)[:4] == 1.0)


def test_reset_opacity(rng):
    c = 16
    params, alive, m, v, counts = make_state(8, c, rng)
    m = jax.tree.map(lambda l: l + 1.0, m)
    p2, m2, v2 = reset_opacity(params, alive, m, v)
    op = np.asarray(act.opacity_activation(p2.opacity))[np.asarray(alive)]
    np.testing.assert_allclose(op, 0.01, rtol=1e-4)
    assert np.all(np.asarray(m2.opacity) == 0)
    assert np.all(np.asarray(m2.xyz) == 1.0)  # other groups untouched
