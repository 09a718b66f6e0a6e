"""Model snapshot loading (reference `Scene.__init__ load_iteration` path +
`GaussianModel.load_ply`, `scene/__init__.py:71-81`, `gaussian_model.py:271-314`)."""

from __future__ import annotations

import json
import os

import numpy as np

import jax.numpy as jnp

from gsplat_tpu.data import ply as ply_io
from gsplat_tpu.core.types import GaussianParams
from gsplat_tpu.model import round_up
from gsplat_tpu.train.densify import sanitize_dead_rows


def search_max_iteration(point_cloud_dir: str) -> int:
    """`searchForMaxIteration` (`utils/system_utils.py:26-28`)."""
    iters = [
        int(d.split("_")[-1])
        for d in os.listdir(point_cloud_dir)
        if d.startswith("iteration_")
    ]
    if not iters:
        raise FileNotFoundError(f"no iteration_* snapshots under {point_cloud_dir}")
    return max(iters)


def load_snapshot(model_path: str, iteration: int = -1, pad_to_multiple: int = 256):
    """Load a trained model -> (params, alive, loaded_iteration, exposure dict)."""
    pc_dir = os.path.join(model_path, "point_cloud")
    if iteration == -1:
        iteration = search_max_iteration(pc_dir)
    ply_path = os.path.join(pc_dir, f"iteration_{iteration}", "point_cloud.ply")
    raw = ply_io.load_gaussian_ply(ply_path)
    n = raw["xyz"].shape[0]
    cap = round_up(n, pad_to_multiple)

    def pad(a):
        return jnp.asarray(
            np.concatenate([a, np.zeros((cap - n,) + a.shape[1:], a.dtype)], axis=0)
        )

    params = GaussianParams(
        xyz=pad(raw["xyz"]),
        features_dc=pad(raw["features_dc"]),
        features_rest=pad(raw["features_rest"]),
        scaling=pad(raw["scaling"]),
        rotation=pad(raw["rotation"]),
        opacity=pad(raw["opacity"]),
    )
    alive = jnp.arange(cap) < n
    params = sanitize_dead_rows(params, alive)

    exposure = None
    exp_path = os.path.join(model_path, "exposure.json")
    if os.path.exists(exp_path):
        with open(exp_path) as f:
            exposure = {k: np.asarray(v, np.float32) for k, v in json.load(f).items()}
    return params, alive, iteration, exposure
