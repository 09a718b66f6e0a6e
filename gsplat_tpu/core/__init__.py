from gsplat_tpu.core.types import (
    Camera,
    GaussianParams,
    RenderSettings,
    make_render_settings,
    pytree_dataclass,
)

__all__ = [
    "Camera",
    "GaussianParams",
    "RenderSettings",
    "make_render_settings",
    "pytree_dataclass",
]
