"""reduce_by_gid (gid sort-back + streaming one-hot reduce) vs scatter-add.

The kernel runs in the Pallas interpreter on CPU; the same comparison runs
on real TPU via scripts/validate_hw.py. Reference semantics being replaced:
atomicAdd gradient accumulation (`cuda_rasterizer/backward.cu:593-635`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsplat_tpu.ops.reduce import N_ROWS, reduce_by_gid


def scatter_ref(dinst, gid, n):
    out = np.zeros((N_ROWS, n), np.float64)
    d = np.asarray(dinst, np.float64)
    g = np.asarray(gid)
    for i in range(g.shape[0]):
        out[:, g[i]] += d[:, i]
    out[10:] = 0.0
    return out.astype(np.float32)


def check(k, n, gid_mode, seed=0):
    rng = np.random.default_rng(seed)
    dinst = rng.standard_normal((N_ROWS, k)).astype(np.float32)
    dinst[10:] = 0.0  # only rows 0..9 are meaningful
    if gid_mode == "uniform":
        gid = rng.integers(0, n, k, dtype=np.int32)
    elif gid_mode == "clustered":
        gid = np.sort(rng.integers(0, max(n // 50, 1), k, dtype=np.int32)) * 47 % n
    elif gid_mode == "one":
        gid = np.full(k, n - 1, np.int32)
    elif gid_mode == "sparse":
        # ~1 instance per gaussian, ids spread over the whole range
        gid = rng.choice(n, size=min(k, n), replace=False).astype(np.int32)
        gid = np.concatenate([gid, rng.integers(0, n, k - gid.shape[0], np.int32)])
    out = reduce_by_gid(jnp.asarray(dinst), jnp.asarray(gid), n)
    ref = scatter_ref(dinst, gid, n)
    got = np.array(out)
    got[10:] = 0.0  # rows 10..15 are documented scratch garbage
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("gid_mode", ["uniform", "clustered", "one", "sparse"])
def test_reduce_modes(gid_mode):
    check(k=5000, n=700, gid_mode=gid_mode)


def test_reduce_small_and_unaligned():
    check(k=100, n=130, gid_mode="uniform", seed=1)  # k < one chunk
    check(k=512, n=128, gid_mode="uniform", seed=2)  # exact chunk
    check(k=1537, n=999, gid_mode="clustered", seed=3)  # unaligned both axes


def test_reduce_zero_grads_and_gid_zero():
    # masked-invalid slots: gid 0 with zero rows must not corrupt column 0
    rng = np.random.default_rng(5)
    k, n = 2048, 300
    dinst = rng.standard_normal((N_ROWS, k)).astype(np.float32)
    dinst[10:] = 0.0
    gid = rng.integers(0, n, k, dtype=np.int32)
    dead = rng.random(k) < 0.3
    dinst[:, dead] = 0.0
    gid[dead] = 0
    out = np.array(reduce_by_gid(jnp.asarray(dinst), jnp.asarray(gid), n))
    ref = scatter_ref(dinst, gid, n)
    out[10:] = 0.0
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-5)


def test_reduce_large_n_zero_fill():
    # gaussians with no instances must come back exactly zero (the flush
    # path writes skipped blocks from still-zero ring slots)
    k, n = 600, 5000
    rng = np.random.default_rng(7)
    dinst = rng.standard_normal((N_ROWS, k)).astype(np.float32)
    dinst[10:] = 0.0
    gid = np.sort(rng.integers(0, 40, k, dtype=np.int32)) * 100  # only low ids
    out = np.array(reduce_by_gid(jnp.asarray(dinst), jnp.asarray(gid), n))
    ref = scatter_ref(dinst, gid, n)
    out[10:] = 0.0
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-5)
    assert np.all(out[:, 4000:] == 0.0)


def test_reduce_pack_bf16_close_to_f32():
    """pack_bf16=True rides the gradient rows through the sort as bf16
    pairs: the result must match the f32 reduction to bf16 tolerance
    (per-instance contributions round before the f32 accumulation)."""
    rng = np.random.default_rng(5)
    n, k = 300, 4096
    gid = np.sort(rng.integers(0, n, k)).astype(np.int32)
    dinst = np.zeros((N_ROWS, k), np.float32)
    dinst[:10] = rng.normal(0, 1.0, (10, k)).astype(np.float32)
    exact = np.array(reduce_by_gid(jnp.asarray(dinst), jnp.asarray(gid), n))
    packed = np.array(
        reduce_by_gid(jnp.asarray(dinst), jnp.asarray(gid), n, pack_bf16=True)
    )
    scale = np.abs(exact[:10]).max()
    err = np.abs(packed[:10] - exact[:10]).max() / scale
    assert err < 2e-2, err
    # and the packed path is still a real reduction (not zeros)
    assert np.abs(packed[:10]).max() > 0.1 * scale
