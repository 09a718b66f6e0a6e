"""Spatial helpers: KNN distances for scale init.

The reference initializes log-scales from the mean squared distance to the 3
nearest neighbors, computed by the `simple-knn` CUDA submodule
(`scene/gaussian_model.py:159-160`, submodule declared `.gitmodules:1-3`).
Here: a chunked brute-force top-k in jnp — distance blocks are (chunk, N)
matmuls, which XLA maps straight onto the MXU. Init-time only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mean_knn_sq_dist(points, k: int = 3, chunk: int = 2048):
    """Mean squared distance from each point to its k nearest neighbors.

    Equivalent to `simple_knn._C.distCUDA2` as used at init
    (`scene/gaussian_model.py:159`).

    Args:
      points: (N, 3) float32.
      k: neighbor count (3 in the reference).
      chunk: rows per distance block.

    Returns:
      (N,) mean of squared distances to the k nearest neighbors (self excluded).
    """
    n = points.shape[0]
    pad = (-n) % chunk
    pts_pad = jnp.pad(points, ((0, pad), (0, 0)))
    sq_norms = jnp.sum(points * points, axis=-1)  # (N,)

    def one_chunk(chunk_pts):
        # d2[i, j] = |ci|^2 - 2 ci.pj + |pj|^2
        cross = jnp.matmul(chunk_pts, points.T,
                           precision=jax.lax.Precision.HIGHEST)  # (chunk, N)
        # HIGHEST is required: |x|^2 - 2xy + |y|^2 cancels to ~1e-3 for near
        # neighbors; TPU bf16 matmul noise (~3e-2) would swamp the result
        # and corrupt every initial scale
        d2 = jnp.sum(chunk_pts * chunk_pts, axis=-1)[:, None] - 2.0 * cross + sq_norms[None, :]
        # k+1 smallest (the ~0 self-distance first) via iterative min
        # extraction: k+1 masked VPU reduces. NOT lax.top_k — that lowers to
        # a full per-row sort on TPU (minutes at N=100k).
        cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        work = d2
        acc = jnp.zeros(d2.shape[0], d2.dtype)
        for i in range(k + 1):
            idx = jnp.argmin(work, axis=1)  # (chunk,)
            m = jnp.min(work, axis=1)
            if i > 0:  # skip the self match
                acc = acc + jnp.maximum(m, 0.0)
            work = jnp.where(cols == idx[:, None], jnp.inf, work)
        return acc / k

    chunks = pts_pad.reshape(-1, chunk, 3)
    out = jax.lax.map(one_chunk, chunks).reshape(-1)
    return out[:n]
