"""Test harness config.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(`gsplat_tpu/parallel/`) are exercised without TPU hardware. The TPU (axon)
plugin in this image force-registers itself from sitecustomize before any
user code, so plain JAX_PLATFORMS env handling is not enough — we switch the
platform via jax.config, which takes effect because the CPU backend
initializes lazily on first use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest
from PIL import Image

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


import json


@pytest.fixture(scope="session")
def mini_blender(tmp_path_factory):
    """A 3-view synthetic scene: 48x48 white-background renders of a colored
    quadrant pattern (content does not matter — the loop must just run and
    reduce loss)."""
    root = tmp_path_factory.mktemp("mini_blender")
    rng = np.random.default_rng(7)
    frames = []
    for i in range(3):
        angle = i * 2.0 * np.pi / 3
        # simple orbit camera at radius 4 looking at origin (OpenGL c2w)
        pos = np.array([4 * np.sin(angle), 0.0, 4 * np.cos(angle)])
        z = pos / np.linalg.norm(pos)  # OpenGL: camera looks down -z
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, pos
        img = np.zeros((48, 48, 4), np.uint8)
        img[:24, :24] = [255, 40, 40, 255]
        img[24:, 24:] = [40, 40, 255, 255]
        img[:24, 24:] = [40, 255, 40, 200]
        name = f"r_{i}"
        Image.fromarray(img).save(root / f"{name}.png")
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
    for split in ("train", "test"):
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    return str(root)


