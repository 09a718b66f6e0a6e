"""Core pytree types for the TPU Gaussian-splatting framework.

The reference keeps model state as six `nn.Parameter` tensors plus python-side
bookkeeping (reference `scene/gaussian_model.py:54-66`). Here the model is a
single immutable pytree so the whole training step can be jitted and sharded.
Capacity is static: arrays are allocated at `capacity` rows and an `alive`
mask marks which rows are live (densification grows/shrinks the mask, never
the arrays — see `gsplat_tpu/train/densify.py`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

Array = Any


def pytree_dataclass(cls=None, *, meta_fields: tuple = ()):
    """Register a frozen dataclass as a JAX pytree with static meta fields."""
    if cls is None:
        return partial(pytree_dataclass, meta_fields=meta_fields)
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = tuple(
        f.name for f in dataclasses.fields(cls) if f.name not in meta_fields
    )
    jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)

    cls.replace = replace
    return cls


@pytree_dataclass
class GaussianParams:
    """Learnable Gaussian parameters (pre-activation), shape-(capacity, ...).

    Same parameterization as the reference model (`scene/gaussian_model.py:54-59`
    with activations at `:32-47`): log-scales, unnormalized quaternions
    (wxyz), logit opacities, SH features split into DC and rest bands.
    """

    xyz: Array  # (N, 3) world positions
    features_dc: Array  # (N, 1, 3) SH band-0 coefficients
    features_rest: Array  # (N, K-1, 3) higher SH bands, K=(max_deg+1)^2
    scaling: Array  # (N, 3) log-scales
    rotation: Array  # (N, 4) quaternion wxyz (unnormalized)
    opacity: Array  # (N, 1) logit opacity

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def max_sh_degree(self) -> int:
        k = 1 + self.features_rest.shape[1]
        return int(round(k**0.5)) - 1

    def astype(self, dtype) -> "GaussianParams":
        return jax.tree.map(lambda a: a.astype(dtype), self)


@pytree_dataclass(meta_fields=("width", "height"))
class Camera:
    """A single calibrated view.

    Matrix conventions match the reference (`scene/cameras.py:86-89`,
    `utils/graphics_utils.py:38-71`) but in plain math (row-vector free) form:
    `world_view` maps world -> camera as ``x_cam = world_view @ [x, 1]`` and
    `full_proj = proj @ world_view` so ``p_hom = full_proj @ [x, 1]``.
    (The reference stores the transposes of these because glm/torch multiply
    row-vectors from the left; the CUDA kernels then index them column-first,
    which lands on exactly this math.)

    Only width/height are static (they set array shapes). Identity metadata
    (image name, uid, depth flags) lives on the host-side LoadedCamera —
    putting it here would make every distinct camera a fresh jit cache miss.
    """

    world_view: Array  # (4, 4) world -> camera
    full_proj: Array  # (4, 4) projection @ world_view
    camera_center: Array  # (3,) camera position in world space
    tan_fovx: Array  # () scalar
    tan_fovy: Array  # () scalar
    width: int = 0
    height: int = 0

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tan_fovy)


@pytree_dataclass(
    meta_fields=(
        "tile",
        "instance_capacity",
        "max_per_tile",
        "chunk",
        "antialiasing",
        "sh_degree",
        "backend",
        "packet_dtype",
        "tight_cull",
        "track_contrib",
        "blend_mode",
    )
)
class RenderSettings:
    """Static rasterization configuration (hashable; part of the jit key).

    `tile` mirrors the reference BLOCK_X/BLOCK_Y=16 (`config.h:15-16`).
    `instance_capacity` bounds the (gaussian, tile)-instance buffer that the
    reference sizes dynamically via cub InclusiveSum (`rasterizer_impl.cu:280`);
    XLA needs it static, so overflow is detected and reported instead.
    `max_per_tile` bounds the per-tile blend walk in the jnp (non-Pallas)
    rasterizer only. `sh_degree` is the *active* SH degree.
    """

    scale_modifier: Array = 1.0
    tile: int = 16
    instance_capacity: int = 1 << 18
    max_per_tile: int = 1024
    chunk: int = 128
    antialiasing: bool = False
    sh_degree: int = 3
    backend: str = "jnp"  # "jnp" | "pallas"
    # "float32" (parity) | "hybrid" (positions f32, value columns bf16-packed
    # through the sort + packed gradient reduce; blend sees f32 packets) |
    # "bfloat16" (everything bf16 — fails trained-quality certification at
    # 800px scale, kept for forward/serving; see artifacts/cert_r4)
    packet_dtype: str = "float32"
    # drop (gaussian, tile) instances whose max alpha over the tile is provably
    # < 1/255 — the per-pixel blend skips them everywhere, so renders and
    # gradients are unchanged while instance counts shrink ~30-50%
    tight_cull: bool = True
    # track the per-pixel last-contributor index (forward.cu:347-384 parity).
    # Costs ~25% of the forward blend kernel; nothing in training consumes it
    # (the backward re-walks the stream), so it's opt-in.
    track_contrib: bool = False
    # "sorted" = reference-parity front-to-back blend over the (tile, depth)
    # sort order. "oit" = opt-in order-independent transmittance: per-pixel
    # depth-weighted commutative sums (weighted-blended OIT adapted to 3DGS;
    # PERF_HEADROOM #4 / PAPERS.md) — exact total transmittance, approximate
    # occlusion ordering, NO sequential recurrences in forward or backward.
    blend_mode: str = "sorted"  # "sorted" | "oit"


def make_render_settings(**kw) -> RenderSettings:
    kw.setdefault("scale_modifier", jnp.float32(1.0))
    return RenderSettings(**kw)
