"""gsplat_tpu — a TPU-native 3D Gaussian Splatting framework (JAX/XLA/Pallas).

Brand-new implementation of the full capability set of the reference
(aki-k-no/gaussian-splatting-npu, i.e. graphdeco-inria/gaussian-splatting at
feature level `dr_aa` plus its NPU forward-renderer work), re-designed for TPU:

- differentiable tile-based rasterizer: per-Gaussian EWA projection / SH color
  as batched jnp (VPU/MXU), (tile, depth)-key binning via `jax.lax.sort`, and a
  front-to-back alpha blend where each 16x16 tile becomes (256 px x 128 gauss)
  alpha matrices + MXU matmuls — as Pallas kernels with a custom VJP.
- fully-jitted training loop: L1 + SSIM, depth-L1 regularization, exposure
  compensation, Adam with per-group LRs, and densify/clone/split/prune
  re-designed as static-capacity masked updates (no tensor-surgery).
- multi-chip scaling via `jax.sharding.Mesh` + `shard_map`: Gaussian-sharded
  preprocessing, all-gathered screen-space packets, tile-sharded blending, and
  `psum` gradient reduction over ICI.

See SURVEY.md at the repo root for the structural map of the reference that
this framework re-creates.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: programs here are huge (full train step
# with Pallas kernels) and this image's TPU compiles go through a slow remote
# relay — caching across processes turns multi-minute recompiles into reloads.
# jax may already be imported (env vars are read at import), so set via
# jax.config; env GSPLAT_NO_COMP_CACHE=1 disables.
import os as _os

if not _os.environ.get("GSPLAT_NO_COMP_CACHE"):
    import jax as _jax

    try:
        if not _jax.config.jax_compilation_cache_dir:
            _jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

from gsplat_tpu.core.types import GaussianParams, Camera, RenderSettings

__all__ = [
    "GaussianParams",
    "Camera",
    "RenderSettings",
]
