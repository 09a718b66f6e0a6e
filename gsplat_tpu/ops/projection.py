"""Per-Gaussian screen-space preprocessing (projection, EWA cov2D, SH color).

TPU-native re-design of the reference preprocess kernel
(`cuda_rasterizer/forward.cu:155-272`): instead of one CUDA thread per
Gaussian, everything is a batched (N, ...) jnp computation — 3x3 covariance
products become batched matmuls and all the scalar branches become masks, so
XLA fuses the whole stage into a few VPU/MXU loops. Semantics are kept
bit-faithful where they matter for parity:

- near cull at view z <= 0.2 (`auxiliary.h:151-176`)
- homogeneous divide guard `1/(w + 1e-7)` (`forward.cu:199`)
- EWA with focal Jacobian and 1.3*tan_fov frustum clamping (`forward.cu:74-109`)
- +0.3 pixel dilation and the antialiasing opacity rescale
  sqrt(det/det_dilated) clamped at 25e-6 (`forward.cu:218-226`)
- radius = ceil(3*sqrt(max eigenvalue)), eigenvalue floor 0.1 (`forward.cu:240-243`)
- ndc2Pix(v, S) = ((v+1)*S - 1)/2 (`auxiliary.h:40-43`)
- tile rect via truncating division by the 16px tile (`auxiliary.h:45-55`)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# The per-gaussian transforms are tiny (N,3)@(3,3) contractions — not where
# the FLOPs are — so they run at full fp32 precision; on TPU the default would
# route them through the MXU in bf16 and cost ~1e-2 relative error in pixel
# positions.
HIGHEST = jax.lax.Precision.HIGHEST

from gsplat_tpu.core import activations as act
from gsplat_tpu.core import sh as sh_lib
from gsplat_tpu.core.types import Camera, GaussianParams, RenderSettings, pytree_dataclass


@pytree_dataclass
class ScreenGaussians:
    """Per-Gaussian screen-space quantities ("geometry buffer").

    The packed analogue of the reference GeometryState arena
    (`rasterizer_impl.cu:155-170`): means2D, conic+opacity, rgb, depths,
    radii, tile rects.
    """

    mean2d: jax.Array  # (N, 2) pixel-space center
    conic: jax.Array  # (N, 3) inverse 2D covariance [a, b, c]
    opacity: jax.Array  # (N,) effective opacity (AA-rescaled)
    rgb: jax.Array  # (N, 3) SH-evaluated color
    depth: jax.Array  # (N,) view-space z
    radius: jax.Array  # (N,) int32 screen radius in pixels
    cull_qmax: jax.Array  # (N,) f32 tight-cull conic-Q threshold (margin-padded)
    rect_min: jax.Array  # (N, 2) int32 (tile_x, tile_y) inclusive
    rect_max: jax.Array  # (N, 2) int32 (tile_x, tile_y) exclusive
    tiles_touched: jax.Array  # (N,) int32
    mask: jax.Array  # (N,) bool — survives culling


def ndc2pix(v, size):
    return ((v + 1.0) * size - 1.0) * 0.5


def compute_cov2d(p_view, focal_x, focal_y, tan_fovx, tan_fovy, cov3d, world_view):
    """EWA projection of the 3D covariance to a screen-space 2x2 (as 3-vector).

    Math-convention equivalent of `computeCov2D` (`forward.cu:74-109`):
    cov2D = J W Sigma W^T J^T with W the world->cam rotation and J the
    perspective Jacobian evaluated at the frustum-clamped view point. `p_view`
    must have a strictly positive z (culled rows should be sanitized by the
    caller *before* this runs, so no NaNs enter the autodiff graph).
    """
    W = world_view[:3, :3]  # (3, 3)
    t = p_view

    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tz = t[:, 2]
    txtz = jnp.clip(t[:, 0] / tz, -limx, limx)
    tytz = jnp.clip(t[:, 1] / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    # J rows: d(pix)/d(view); only the top 2x3 block is nonzero.
    j00 = focal_x * inv_tz
    j02 = -focal_x * tx * inv_tz2
    j11 = focal_y * inv_tz
    j12 = -focal_y * ty * inv_tz2

    # Componentwise on (N,) columns — batched (N, 2, 3)/(N, 3, 3) einsums
    # tile each tiny matrix to (8, 128) on TPU (~100x memory) and were the
    # hottest part of preprocess. W rows are scalars (host constants).
    w00, w01, w02 = W[0, 0], W[0, 1], W[0, 2]
    w10, w11, w12 = W[1, 0], W[1, 1], W[1, 2]
    w20, w21, w22 = W[2, 0], W[2, 1], W[2, 2]

    # T = J @ W, rows t0 = j00*W0 + j02*W2, t1 = j11*W1 + j12*W2
    t00 = j00 * w00 + j02 * w20
    t01 = j00 * w01 + j02 * w21
    t02 = j00 * w02 + j02 * w22
    t10 = j11 * w10 + j12 * w20
    t11 = j11 * w11 + j12 * w21
    t12 = j11 * w12 + j12 * w22

    c0, c1, c2, c3, c4, c5 = (cov3d[:, i] for i in range(6))
    # u = Sigma @ t0, v = Sigma @ t1 (Sigma symmetric)
    u0 = c0 * t00 + c1 * t01 + c2 * t02
    u1 = c1 * t00 + c3 * t01 + c4 * t02
    u2 = c2 * t00 + c4 * t01 + c5 * t02
    v0 = c0 * t10 + c1 * t11 + c2 * t12
    v1 = c1 * t10 + c3 * t11 + c4 * t12
    v2 = c2 * t10 + c4 * t11 + c5 * t12

    cov_xx = t00 * u0 + t01 * u1 + t02 * u2
    cov_xy = t10 * u0 + t11 * u1 + t12 * u2
    cov_yy = t10 * v0 + t11 * v1 + t12 * v2
    return jnp.stack([cov_xx, cov_xy, cov_yy], axis=-1)


def preprocess(
    params: GaussianParams,
    alive,
    camera: Camera,
    settings: RenderSettings,
    grid_x: int,
    grid_y: int,
    mean2d_offset=None,
) -> ScreenGaussians:
    """Project all Gaussians to screen space (fully batched, jit-friendly).

    Args:
      params: model parameters (pre-activation).
      alive: (N,) bool mask of live rows (static-capacity model).
      camera: view.
      settings: static render settings (tile size, AA flag, active SH degree).
      grid_x, grid_y: tile-grid dimensions (static).
      mean2d_offset: optional (N, 2) zeros added to the pixel-space center —
        the JAX analogue of the reference's `screenspace_points` grad-capture
        tensor (`gaussian_renderer/__init__.py:26-30`).
    """
    xyz = params.xyz
    n = xyz.shape[0]
    tile = settings.tile

    # --- activations (differentiable, same as scene/gaussian_model.py:32-47)
    scales = act.scaling_activation(params.scaling)
    quats = act.normalize_rotation(params.rotation)
    opacities = act.opacity_activation(params.opacity)[:, 0]

    # --- view transform + near cull (auxiliary.h:151-176).
    # Componentwise on (N,) columns: an einsum('nj,ij->ni') here is a batched
    # (1,3)@(3,3) matmul that XLA pads onto MXU tiles (~100x the useful
    # work); 9 fused multiply-adds per row run at VPU rate. Exact f32.
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]

    def affine3(m):
        return jnp.stack(
            [m[i, 0] * x + m[i, 1] * y + m[i, 2] * z + m[i, 3] for i in range(3)],
            axis=-1,
        )

    p_view = affine3(camera.world_view)
    depth = p_view[:, 2]
    valid = alive & (depth > 0.2)

    # --- projection (forward.cu:197-200)
    fp = camera.full_proj
    p_hom = affine3(fp)
    w_hom = fp[3, 0] * x + fp[3, 1] * y + fp[3, 2] * z + fp[3, 3]
    # w_hom equals view z here (P[3,2]=1); >= 0.2 for surviving rows. Sanitize
    # culled rows so 1/(w+1e-7) can't produce inf/NaN in fwd or bwd.
    w_safe = jnp.where(valid, w_hom, 1.0)
    p_w = 1.0 / (w_safe + 1e-7)
    p_proj = p_hom * p_w[:, None]

    # --- 3D covariance (forward.cu:114-151)
    cov3d = act.covariance_from_scaling_rotation(scales, settings.scale_modifier, quats)

    # --- EWA 2D covariance + dilation + antialiasing (forward.cu:216-234)
    # Sanitize z for culled rows *before* the 1/tz math: where() alone would
    # still leak NaNs into the cotangents.
    safe_depth = jnp.where(valid, depth, 1.0)
    p_view_safe = jnp.concatenate([p_view[:, :2], safe_depth[:, None]], axis=-1)
    focal_x = camera.width / (2.0 * camera.tan_fovx)
    focal_y = camera.height / (2.0 * camera.tan_fovy)
    cov = compute_cov2d(
        p_view_safe, focal_x, focal_y, camera.tan_fovx, camera.tan_fovy, cov3d,
        camera.world_view,
    )
    cov = jnp.where(valid[:, None], cov, jnp.array([1.0, 0.0, 1.0]))

    h_var = 0.3
    det_cov = cov[:, 0] * cov[:, 2] - cov[:, 1] * cov[:, 1]
    covd = cov.at[:, 0].add(h_var).at[:, 2].add(h_var)
    det_covd = covd[:, 0] * covd[:, 2] - covd[:, 1] * covd[:, 1]
    if settings.antialiasing:
        h_conv_scaling = jnp.sqrt(jnp.maximum(2.5e-5, det_cov / det_covd))
    else:
        h_conv_scaling = jnp.ones_like(det_cov)

    det = det_covd
    valid = valid & (det != 0.0)
    det_inv = 1.0 / jnp.where(det == 0.0, 1.0, det)
    conic = jnp.stack(
        [covd[:, 2] * det_inv, -covd[:, 1] * det_inv, covd[:, 0] * det_inv], axis=-1
    )

    # --- screen extent / tile rect (forward.cu:240-248)
    mid = 0.5 * (covd[:, 0] + covd[:, 2])
    lam_term = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + lam_term
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 1e-20)))
    radius = radius_f.astype(jnp.int32)

    # Tight-cull threshold for binning: a (gaussian, tile) instance is
    # dropped when the MINIMUM of the conic quadratic Q(dx,dy) =
    # (a*dx^2 + c*dy^2)/2 + b*dx*dy over the tile's pixel box exceeds
    # cull_qmax ~ ln(255*op_eff): then alpha = op*exp(-Q) < 1/255 at EVERY
    # pixel, the blend skips the instance per-pixel (`forward.cu:366`), and
    # dropping it outright changes neither the render nor any gradient. The
    # box minimum is evaluated EXACTLY in the conic metric by binning (the
    # two near-edge 1D minima — see the cull block in binning.py), which
    # culls the elongated/rotated splats an isotropic distance test keeps
    # (measured ~30% of a trained scene's instances). The margin absorbs
    # f32 rounding of the expansion + the Q evaluation, keeping the cull
    # strictly conservative.

    point_image = jnp.stack(
        [ndc2pix(p_proj[:, 0], camera.width), ndc2pix(p_proj[:, 1], camera.height)],
        axis=-1,
    )
    if mean2d_offset is not None:
        point_image = point_image + mean2d_offset

    op_eff = opacities * h_conv_scaling
    ln_term = jnp.log(jnp.maximum(op_eff * 255.0, 1e-12))
    # conservative margin: 1/32 absolute + 1/128 relative in Q-space keeps
    # every instance whose true max alpha is within ~8% of 1/255
    cull_qmax = ln_term + 0.03125 + 0.0078125 * jnp.abs(ln_term)

    # --- reference-rect visibility (getRect, auxiliary.h:45-55): radius and
    # the survivor mask keep the reference's 3*sigma-circle semantics so
    # visibility_filter / max_radii2D densification stats match (`train.py:166`)
    def rect_counts(rx, ry):
        # C-style truncating casts, then clamp — matches getRect
        rmin_x = jnp.clip(((point_image[:, 0] - rx) / tile).astype(jnp.int32), 0, grid_x)
        rmin_y = jnp.clip(((point_image[:, 1] - ry) / tile).astype(jnp.int32), 0, grid_y)
        rmax_x = jnp.clip(
            ((point_image[:, 0] + rx + tile - 1) / tile).astype(jnp.int32), 0, grid_x
        )
        rmax_y = jnp.clip(
            ((point_image[:, 1] + ry + tile - 1) / tile).astype(jnp.int32), 0, grid_y
        )
        return rmin_x, rmin_y, rmax_x, rmax_y

    ref_min_x, ref_min_y, ref_max_x, ref_max_y = rect_counts(radius_f, radius_f)
    tiles_ref = (ref_max_x - ref_min_x) * (ref_max_y - ref_min_y)
    valid = valid & (tiles_ref > 0)

    if settings.tight_cull:
        # --- tight emission rect: instances are emitted from the
        # opacity-aware ellipse AABB instead of the 3*sigma circle.
        # Exact-conservative: the blend keeps a pixel only if
        # alpha = op_eff*exp(-q/2) >= 1/255 with q(dx,dy) >= dx^2/cov_xx (the
        # marginal bound of the dilated quadratic), so every pixel with
        # |dx| > sqrt(2*cov_xx*ln(255*op_eff)) blends to exactly zero,
        # forward and backward — dropping those tiles changes neither renders
        # nor gradients (same argument as cull_qmax above, per axis). The
        # margin absorbs f32 rounding; op_eff*255 < 1 emits nothing.
        vis = op_eff * 255.0 >= 0.999999
        rx2 = 2.0 * covd[:, 0] * ln_term
        ry2 = 2.0 * covd[:, 2] * ln_term
        # +1px: the exclusive-max rect formula ((p + r + tile - 1) / tile,
        # truncating) can exclude a tile whose first pixel sits up to 1px
        # inside r, so the extent itself must over-cover by a full pixel
        rx = jnp.minimum(
            radius_f,
            1.0 + jnp.sqrt(jnp.maximum(rx2 + 4.0 + 0.0625 * jnp.abs(rx2), 0.0)),
        )
        ry = jnp.minimum(
            radius_f,
            1.0 + jnp.sqrt(jnp.maximum(ry2 + 4.0 + 0.0625 * jnp.abs(ry2), 0.0)),
        )
        rmin_x, rmin_y, rmax_x, rmax_y = rect_counts(rx, ry)
        tiles_touched = jnp.where(
            valid & vis, (rmax_x - rmin_x) * (rmax_y - rmin_y), 0
        )
    else:
        # reference rect emission (duplicateWithKeys structure parity)
        rmin_x, rmin_y, rmax_x, rmax_y = ref_min_x, ref_min_y, ref_max_x, ref_max_y
        tiles_touched = jnp.where(valid, tiles_ref, 0)

    # --- SH -> RGB (forward.cu:20-71)
    features = jnp.concatenate([params.features_dc, params.features_rest], axis=1)
    dirs = xyz - camera.camera_center
    rgb, _clamped = sh_lib.eval_sh_color(settings.sh_degree, features, dirs)

    radius = jnp.where(valid, radius, 0)

    return ScreenGaussians(
        mean2d=point_image,
        conic=conic,
        opacity=opacities * h_conv_scaling,
        rgb=rgb,
        depth=depth,
        radius=radius,
        cull_qmax=cull_qmax,
        rect_min=jnp.stack([rmin_x, rmin_y], axis=-1),
        rect_max=jnp.stack([rmax_x, rmax_y], axis=-1),
        tiles_touched=tiles_touched,
        mask=valid,
    )
