"""Model construction: point-cloud init, capacity padding, exposure state.

The reference builds its parameters in `GaussianModel.create_from_pcd`
(`scene/gaussian_model.py:149-176`): SH DC from RGB, log-scales from the mean
3-NN squared distance, identity quaternions, opacity 0.1. Here the same init
lands in a static-`capacity` pytree with an `alive` mask — the TPU-native
answer to densification's tensor surgery (see `gsplat_tpu/train/densify.py`).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from gsplat_tpu.core import sh as sh_lib
from gsplat_tpu.core.activations import inverse_sigmoid
from gsplat_tpu.core.spatial import mean_knn_sq_dist
from gsplat_tpu.core.types import GaussianParams


def round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def init_from_pcd(
    points,
    colors,
    max_sh_degree: int = 3,
    capacity: int | None = None,
    capacity_multiplier: float = 2.0,
):
    """Build (GaussianParams, alive) from an SfM/random point cloud.

    Args:
      points: (N, 3) float32 positions.
      colors: (N, 3) float32 RGB in [0, 1].
      max_sh_degree: maximum SH degree (3 in the reference).
      capacity: total row capacity; default rounds N*capacity_multiplier up to
        a 4096 multiple. Padding is deliberately modest: every per-gaussian
        stage pays per compiled row (an 8x-padded lego step measured ~2x a
        tight one), and the training loop GROWS capacity on demand via
        `train/resize.py` — the TPU answer to the reference's dynamic tensor
        reallocation (`gaussian_model.py:316-386`).
    """
    points = np.asarray(points, np.float32)
    colors = np.asarray(colors, np.float32)
    n = points.shape[0]
    if capacity is None:
        capacity = round_up(max(int(n * capacity_multiplier), 4096), 4096)
    assert capacity >= n, f"capacity {capacity} < initial points {n}"

    k_max = (max_sh_degree + 1) ** 2
    features_dc = sh_lib.rgb_to_sh(colors)[:, None, :]  # (N, 1, 3)
    features_rest = np.zeros((n, k_max - 1, 3), np.float32)

    # log-scale from mean 3-NN squared distance (`gaussian_model.py:156-160`)
    dist2 = np.maximum(np.asarray(mean_knn_sq_dist(jnp.asarray(points))), 1e-7)
    scaling = np.repeat(np.log(np.sqrt(dist2))[:, None], 3, axis=1).astype(np.float32)

    rotation = np.zeros((n, 4), np.float32)
    rotation[:, 0] = 1.0
    opacity = np.full((n, 1), float(inverse_sigmoid(0.1)), np.float32)

    pad = capacity - n

    def padded(a):
        return jnp.asarray(np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)], axis=0))

    params = GaussianParams(
        xyz=padded(points),
        features_dc=padded(features_dc),
        features_rest=padded(features_rest),
        scaling=padded(scaling),
        rotation=padded(rotation),
        opacity=padded(opacity),
    )
    # Dead rows: tiny scale + identity quat + -inf-ish opacity so that even if
    # a mask bug leaks them they contribute nothing and stay numerically tame.
    dead = jnp.arange(capacity) >= n
    params = params.replace(
        scaling=jnp.where(dead[:, None], -15.0, params.scaling),
        rotation=jnp.where(dead[:, None], jnp.array([1.0, 0, 0, 0]), params.rotation),
        opacity=jnp.where(dead[:, None], -15.0, params.opacity),
    )
    alive = jnp.arange(capacity) < n
    return params, alive


def init_exposure(num_images: int):
    """Per-image identity (3, 4) exposure affines (`gaussian_model.py:166-172`)."""
    eye = np.zeros((num_images, 3, 4), np.float32)
    eye[:, :3, :3] = np.eye(3)
    return jnp.asarray(eye)
