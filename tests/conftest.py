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

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
