"""Reference front-to-back alpha blend in pure jnp (differentiable oracle).

This is the jnp re-formulation of the reference blend kernel
(`cuda_rasterizer/forward.cu:277-400`): one CUDA block per 16x16 tile with a
sequential per-pixel walk becomes, per tile, a (256 px, chunk) alpha matrix
whose transmittance recurrence is a cumprod along the gaussian axis, and whose
color accumulation is a (256 x chunk) @ (chunk x 3) matmul — i.e. the blend
maps onto the VPU (alpha) + MXU (color). JAX autodiff supplies the backward
pass, replacing the hand-derived `backward.cu:453-638`; the Pallas kernels in
`rasterize_pallas.py` are the production path and are tested against this.

Blend semantics kept exactly (forward.cu:345-385):
- skip if power > 0
- alpha = min(0.99, opacity * exp(power)); skip if alpha < 1/255
- stop the pixel once T * (1 - alpha) < 1e-4 (the would-be-crossing Gaussian
  is NOT blended) — since T is monotone decreasing this is the prefix
  condition cumprod(1-alpha) >= 1e-4
- out = accumulated color + T_final * background (forward.cu:390-398)
- expected inverse depth sum(w / z) (forward.cu:377-398)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsplat_tpu.core.types import pytree_dataclass
from gsplat_tpu.ops.binning import TileBins
from gsplat_tpu.ops.projection import ScreenGaussians

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


@pytree_dataclass
class BlendOutput:
    color: jax.Array  # (T, 256, 3) per-tile pixel colors (bg composited)
    invdepth: jax.Array  # (T, 256)
    final_t: jax.Array  # (T, 256) remaining transmittance
    n_contrib: jax.Array  # (T, 256) int32 — last contributing instance (1-based)
    overflow: jax.Array  # () int32 — per-tile list truncations (jnp path only)


def tile_pixel_coords(grid_x: int, grid_y: int, tile: int):
    """Pixel-center coordinates for each tile, (T, tile*tile, 2) float32."""
    t_idx = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    tx = (t_idx % grid_x) * tile
    ty = (t_idx // grid_x) * tile
    i = jnp.arange(tile * tile, dtype=jnp.int32)
    px = tx[:, None] + (i % tile)[None, :]
    py = ty[:, None] + (i // tile)[None, :]
    return jnp.stack([px, py], axis=-1).astype(jnp.float32)


def blend_tiles_jnp(
    screen: ScreenGaussians,
    bins: TileBins,
    grid_x: int,
    grid_y: int,
    tile: int,
    max_per_tile: int,
    chunk: int,
) -> BlendOutput:
    """Blend all tiles; fully batched over tiles, scanned over gaussian chunks."""
    num_tiles = grid_x * grid_y
    ppt = tile * tile
    max_per_tile = max(chunk, (max_per_tile + chunk - 1) // chunk * chunk)

    pix = tile_pixel_coords(grid_x, grid_y, tile)  # (T, ppt, 2)

    lane = jnp.arange(max_per_tile, dtype=jnp.int32)
    idx = bins.tile_start[:, None] + lane[None, :]  # (T, M)
    in_range = idx < bins.tile_end[:, None]
    idx = jnp.minimum(idx, bins.gauss_id.shape[0] - 1)
    per_tile_overflow = jnp.maximum(
        bins.tile_end - bins.tile_start - max_per_tile, 0
    ).sum()

    # Pre-gather safe per-gaussian features (sanitized so masked lanes can't
    # inject inf/NaN through 0*inf):
    inv_depth = 1.0 / jnp.maximum(screen.depth, 0.2)

    n_chunks = max_per_tile // chunk
    idx_chunks = jnp.moveaxis(idx.reshape(num_tiles, n_chunks, chunk), 1, 0)
    msk_chunks = jnp.moveaxis(in_range.reshape(num_tiles, n_chunks, chunk), 1, 0)

    def step(carry, xs):
        # Two transmittance carries (forward.cu:345-385 semantics):
        #   t_raw — product of ALL walked (1-alpha); the 1e-4 stop test
        #     "t_raw >= eps" identifies the blended prefix exactly, because the
        #     stop is permanent and raw == effective before the crossing point.
        #   t_eff — product over *blended* (1-alpha) only; this is the real
        #     remaining transmittance (final_T for background compositing).
        t_raw, t_eff, color, invd, n_contrib, base = carry
        ids, m = xs  # (T, C), (T, C)
        g = bins.gauss_id[ids]  # (T, C) gaussian indices
        mean2d = screen.mean2d[g]  # (T, C, 2)
        conic = screen.conic[g]  # (T, C, 3)
        opac = screen.opacity[g]  # (T, C)
        rgb = screen.rgb[g]  # (T, C, 3)
        invz = inv_depth[g]  # (T, C)

        d = mean2d[:, None, :, :] - pix[:, :, None, :]  # (T, ppt, C, 2)
        dx, dy = d[..., 0], d[..., 1]
        a, b, c = conic[..., 0], conic[..., 1], conic[..., 2]
        power = (
            -0.5 * (a[:, None, :] * dx * dx + c[:, None, :] * dy * dy)
            - b[:, None, :] * dx * dy
        )  # (T, ppt, C)
        alpha_raw = opac[:, None, :] * jnp.exp(power)
        # forward: min(alpha, 0.99); backward: straight-through — the reference
        # backward ignores the clamp (`backward.cu:569-570,625-635` uses dG and
        # dopacity unconditionally), so jnp.minimum's zero-grad would diverge.
        alpha = alpha_raw + jax.lax.stop_gradient(
            jnp.minimum(alpha_raw, ALPHA_MAX) - alpha_raw
        )
        keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & m[:, None, :]
        alpha = jnp.where(keep, alpha, 0.0)

        t_incl_raw = t_raw[..., None] * jnp.cumprod(1.0 - alpha, axis=-1)
        blended = jax.lax.stop_gradient(t_incl_raw >= T_EPS)
        alpha_eff = jnp.where(blended, alpha, 0.0)
        t_excl_raw = t_raw[..., None] * jnp.concatenate(
            [
                jnp.ones_like(alpha[..., :1]),
                jnp.cumprod(1.0 - alpha[..., :-1], axis=-1),
            ],
            axis=-1,
        )
        # For blended lanes raw == effective transmittance (prefix property),
        # so the raw exclusive product is the correct blend weight.
        w = alpha_eff * t_excl_raw  # (T, ppt, C)

        color = color + jnp.einsum(
            "tpc,tcx->tpx", w, rgb, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST
        )
        invd = invd + jnp.sum(w * invz[:, None, :], axis=-1)
        t_raw = t_incl_raw[..., -1]
        t_eff = t_eff * jnp.prod(1.0 - alpha_eff, axis=-1)

        # n_contrib: 1-based index of the last blended instance in this pixel's
        # range (forward.cu:347-384 `last_contributor`). Skipped-but-walked
        # instances still advance the counter.
        any_blended = jnp.any(blended & (alpha > 0.0), axis=-1)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 2)
        last_in_chunk = jnp.max(
            jnp.where(blended & (alpha > 0.0), lane_i + 1, 0), axis=-1
        )
        n_contrib = jnp.where(any_blended, base + last_in_chunk, n_contrib)
        return (t_raw, t_eff, color, invd, n_contrib, base + chunk), None

    init = (
        jnp.ones((num_tiles, ppt), jnp.float32),
        jnp.ones((num_tiles, ppt), jnp.float32),
        jnp.zeros((num_tiles, ppt, 3), jnp.float32),
        jnp.zeros((num_tiles, ppt), jnp.float32),
        jnp.zeros((num_tiles, ppt), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    (_, t_final, color, invd, n_contrib, _), _ = jax.lax.scan(
        step, init, (idx_chunks, msk_chunks)
    )

    return BlendOutput(
        color=color,
        invdepth=invd,
        final_t=t_final,
        n_contrib=n_contrib,
        overflow=per_tile_overflow.astype(jnp.int32),
    )


def blend_tiles_oit_jnp(
    screen: ScreenGaussians,
    bins: TileBins,
    grid_x: int,
    grid_y: int,
    tile: int,
    max_per_tile: int,
    chunk: int,
) -> BlendOutput:
    """Order-independent transmittance blend (jnp oracle for the OIT mode).

    Weighted-blended OIT adapted to 3DGS (PERF_HEADROOM #4): per pixel,
    commutative sums replace the front-to-back recurrence —

        N    = sum_i alpha_i w_i [r, g, b, invz]_i   (w_i = invz_i^2)
        D    = sum_i alpha_i w_i
        T    = prod_i (1 - alpha_i)                  (exact, order-free)
        out  = N / max(D, eps) * (1 - T);  final_t = T

    alpha/keep rules are identical to the sorted path, so a scene whose
    splats rarely overlap renders identically; overlapping splats blend by
    depth weight instead of strict occlusion order. No sort order is
    consumed (the instance stream may arrive in any per-tile order)."""
    num_tiles = grid_x * grid_y
    ppt = tile * tile
    max_per_tile = max(chunk, (max_per_tile + chunk - 1) // chunk * chunk)
    pix = tile_pixel_coords(grid_x, grid_y, tile)

    lane = jnp.arange(max_per_tile, dtype=jnp.int32)
    idx = bins.tile_start[:, None] + lane[None, :]
    in_range = idx < bins.tile_end[:, None]
    idx = jnp.minimum(idx, bins.gauss_id.shape[0] - 1)
    per_tile_overflow = jnp.maximum(
        bins.tile_end - bins.tile_start - max_per_tile, 0
    ).sum()
    inv_depth = 1.0 / jnp.maximum(screen.depth, 0.2)

    n_chunks = max_per_tile // chunk
    idx_chunks = jnp.moveaxis(idx.reshape(num_tiles, n_chunks, chunk), 1, 0)
    msk_chunks = jnp.moveaxis(in_range.reshape(num_tiles, n_chunks, chunk), 1, 0)

    def step(carry, xs):
        numer, denom, logt = carry
        ids, m = xs
        g = bins.gauss_id[ids]
        mean2d = screen.mean2d[g]
        conic = screen.conic[g]
        opac = screen.opacity[g]
        rgb = screen.rgb[g]
        invz = inv_depth[g]

        d = mean2d[:, None, :, :] - pix[:, :, None, :]
        dx, dy = d[..., 0], d[..., 1]
        a, b, c = conic[..., 0], conic[..., 1], conic[..., 2]
        power = (
            -0.5 * (a[:, None, :] * dx * dx + c[:, None, :] * dy * dy)
            - b[:, None, :] * dx * dy
        )
        alpha_raw = opac[:, None, :] * jnp.exp(power)
        alpha = alpha_raw + jax.lax.stop_gradient(
            jnp.minimum(alpha_raw, ALPHA_MAX) - alpha_raw
        )
        keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & m[:, None, :]
        alpha = jnp.where(keep, alpha, 0.0)

        wz = (invz * invz)[:, None, :]
        aw = alpha * wz  # (T, ppt, C)
        feat = jnp.concatenate([rgb, invz[..., None]], axis=-1)  # (T, C, 4)
        numer = numer + jnp.einsum(
            "tpc,tcx->tpx", aw, feat, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        denom = denom + jnp.sum(aw, axis=-1)
        logt = logt + jnp.sum(jnp.log1p(-alpha), axis=-1)
        return (numer, denom, logt), None

    init = (
        jnp.zeros((num_tiles, ppt, 4), jnp.float32),
        jnp.zeros((num_tiles, ppt), jnp.float32),
        jnp.zeros((num_tiles, ppt), jnp.float32),
    )
    (numer, denom, logt), _ = jax.lax.scan(step, init, (idx_chunks, msk_chunks))

    t_final = jnp.exp(logt)
    w = (1.0 - t_final) / jnp.maximum(denom, 1e-8)
    return BlendOutput(
        color=numer[..., 0:3] * w[..., None],
        invdepth=numer[..., 3] * w,
        final_t=t_final,
        n_contrib=jnp.zeros((num_tiles, ppt), jnp.int32),
        overflow=per_tile_overflow.astype(jnp.int32),
    )


def tiles_to_image(tiled, grid_x: int, grid_y: int, tile: int, width: int, height: int):
    """(T, tile*tile, C?) -> (H, W, C?) crop."""
    chans = tiled.shape[2:] if tiled.ndim > 2 else ()
    img = tiled.reshape((grid_y, grid_x, tile, tile) + chans)
    img = jnp.moveaxis(img, 2, 1).reshape((grid_y * tile, grid_x * tile) + chans)
    return img[:height, :width]
