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


# Two-tier suite: `pytest -m "not slow"` is the <2-minute smoke tier; the
# full suite (~10-17 min depending on host load) adds these. Centralized
# here (rather than per-test decorators) so the tier assignment lives next
# to its criterion: anything measured >=9 s on this image's 4-core host
# (pytest --durations, 2026-08-20). New tests that cross that line get
# added here.
_SLOW_TESTS = {
    # Pallas-interpreter kernel equivalence (minutes each on CPU)
    "test_backward_large_splats_far_centers",
    "test_streaming_protocol_boundary_patterns",
    "test_forward_matches_jnp",
    "test_backward_matches_jnp_autodiff",
    "test_oit_backward_matches_jnp_autodiff",
    "test_oit_empty_and_nonoverlapping_match_sorted",
    "test_saturation_early_out_is_exact",
    "test_tile_pairing_matches_unpaired",
    "test_tile_pairing_oit_matches_unpaired",
    "test_tile_pairing_boundary_patterns",
    "test_empty_tiles_are_background",
    # full train loops
    "test_gaussian_capacity_grows_during_densification",
    "test_train_loop_sharded_mesh",
    "test_train_loop_pipeline_band_exchange",
    "test_pipeline_band_overflow_surfaces",
    "test_train_loop_end_to_end",
    "test_colmap_train_render_end_to_end",
    "test_gaussian_gt_fixture_roundtrip",
    "test_render_and_metrics_cli",
    "test_cfg_args_roundtrip",  # shares the trained-model session fixture
    "test_bf16_packets_close_to_f32",
    "test_hybrid_packets_positions_exact_values_close",
    "test_unroll_bitwise_matches_baseline",
    # 8-virtual-device mesh equivalence
    "test_dryrun_multichip_entry",
    "test_band_exchange_matches_full_gather",
    "test_sharded_pallas_gradients_match",
    "test_sharded_gradients_match",
    "test_sharded_train_step_matches_single_device",
    "test_pipeline_train_step_matches_single_device",
    # heavyweight oracle sweeps
    "test_tight_cull_exact",
    "test_tight_cull_blend_equivalence",
    "test_tight_cull_is_conservative",
    "test_pack_bins_matches_bin_gaussians",
    "test_row_runs_cover_per_tile_test",
    "test_resize_roundtrip_preserves_render",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = getattr(item, "originalname", None) or item.name
        if name in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


import json


def _write_mini_blender(root, size):
    """A 3-view synthetic scene: size x size white-background renders of a
    colored quadrant pattern (content does not matter — the loop must just
    run and reduce loss)."""
    frames = []
    h = size // 2
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
        img = np.zeros((size, size, 4), np.uint8)
        img[:h, :h] = [255, 40, 40, 255]
        img[h:, h:] = [40, 40, 255, 255]
        img[:h, h:] = [40, 255, 40, 200]
        name = f"r_{i}"
        Image.fromarray(img).save(root / f"{name}.png")
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
    for split in ("train", "test"):
        with open(root / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    return str(root)


@pytest.fixture(scope="session")
def mini_blender(tmp_path_factory):
    return _write_mini_blender(tmp_path_factory.mktemp("mini_blender"), 48)


@pytest.fixture(scope="session")
def mini_blender64(tmp_path_factory):
    """64x64 variant: 4 tile rows, so a GxT mesh with T in {2, 4} takes the
    explicit shard_map pipeline path instead of the GSPMD fallback."""
    return _write_mini_blender(tmp_path_factory.mktemp("mini_blender64"), 64)


