"""Independent numpy transcription of the reference rasterizer semantics.

This is the test oracle: a deliberately scalar/loop-structured NumPy
implementation of the math in `cuda_rasterizer/forward.cu` (preprocess:
155-272, blend: 277-400), `auxiliary.h` (ndc2Pix:40, getRect:45, frustum
cull:151) and the activation conventions of `scene/gaussian_model.py:32-47`.
It shares no code with the production jnp/Pallas path — any vectorization or
indexing bug in the framework shows up as a mismatch against this.

Follows the ladder-of-fidelity test pattern the reference itself uses
(GS-IRON base -> bfloat -> npu-1, see SURVEY.md §4.3).
"""

from __future__ import annotations

import math

import numpy as np

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396]
SH_C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435]


def quat_rotmat(q):
    r, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
            [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
            [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def eval_sh(deg, sh, d):
    d = d / np.linalg.norm(d)
    x, y, z = d
    res = SH_C0 * sh[0]
    if deg > 0:
        res = res - SH_C1 * y * sh[1] + SH_C1 * z * sh[2] - SH_C1 * x * sh[3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            res = (res + SH_C2[0] * xy * sh[4] + SH_C2[1] * yz * sh[5]
                   + SH_C2[2] * (2 * zz - xx - yy) * sh[6]
                   + SH_C2[3] * xz * sh[7] + SH_C2[4] * (xx - yy) * sh[8])
            if deg > 2:
                res = (res + SH_C3[0] * y * (3 * xx - yy) * sh[9]
                       + SH_C3[1] * xy * z * sh[10]
                       + SH_C3[2] * y * (4 * zz - xx - yy) * sh[11]
                       + SH_C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[12]
                       + SH_C3[4] * x * (4 * zz - xx - yy) * sh[13]
                       + SH_C3[5] * z * (xx - yy) * sh[14]
                       + SH_C3[6] * x * (xx - 3 * yy) * sh[15])
    return np.maximum(res + 0.5, 0.0)


def render_oracle(
    xyz,
    log_scaling,
    rotation,
    logit_opacity,
    features,  # (N, K, 3) SH coeffs, dc first
    world_view,  # (4,4) math convention: x_cam = V @ [x,1]
    full_proj,  # (4,4) math convention
    cam_center,  # (3,)
    width,
    height,
    tan_fovx,
    tan_fovy,
    sh_degree,
    bg,
    antialiasing=False,
    scale_modifier=1.0,
    tile=16,
):
    n = xyz.shape[0]
    focal_x = width / (2 * tan_fovx)
    focal_y = height / (2 * tan_fovy)
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile

    scales = np.exp(log_scaling) * scale_modifier
    opac = 1.0 / (1.0 + np.exp(-logit_opacity.reshape(n)))

    mean2d = np.zeros((n, 2))
    conic = np.zeros((n, 3))
    depth = np.zeros(n)
    radius = np.zeros(n, dtype=np.int64)
    rgb = np.zeros((n, 3))
    eff_op = np.zeros(n)
    rects = np.zeros((n, 4), dtype=np.int64)

    instances = []  # (tile_id, depth, gauss_idx)

    for i in range(n):
        p = xyz[i]
        p_view = world_view[:3, :3] @ p + world_view[:3, 3]
        if p_view[2] <= 0.2:
            continue
        p_hom = full_proj @ np.append(p, 1.0)
        p_w = 1.0 / (p_hom[3] + 1e-7)
        p_proj = p_hom[:3] * p_w

        # cov3D (forward.cu:114-151): Sigma = (S R)^T (S R) with glm layout
        # == R_math diag(s^2) R_math^T in math convention.
        R = quat_rotmat(rotation[i])
        M = R * scales[i][None, :]
        Sigma = M @ M.T

        # cov2D (forward.cu:74-109)
        t = p_view.copy()
        limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
        txtz, tytz = t[0] / t[2], t[1] / t[2]
        t[0] = min(limx, max(-limx, txtz)) * t[2]
        t[1] = min(limy, max(-limy, tytz)) * t[2]
        J = np.array(
            [
                [focal_x / t[2], 0, -focal_x * t[0] / t[2] ** 2],
                [0, focal_y / t[2], -focal_y * t[1] / t[2] ** 2],
            ]
        )
        Wr = world_view[:3, :3]
        cov = J @ Wr @ Sigma @ Wr.T @ J.T
        c_xx, c_xy, c_yy = cov[0, 0], cov[0, 1], cov[1, 1]

        det_cov = c_xx * c_yy - c_xy * c_xy
        c_xx += 0.3
        c_yy += 0.3
        det = c_xx * c_yy - c_xy * c_xy
        h_scale = math.sqrt(max(2.5e-5, det_cov / det)) if antialiasing else 1.0
        if det == 0.0:
            continue
        conic_i = np.array([c_yy, -c_xy, c_xx]) / det

        mid = 0.5 * (c_xx + c_yy)
        lam1 = mid + math.sqrt(max(0.1, mid * mid - det))
        r_i = math.ceil(3.0 * math.sqrt(lam1))
        px = ((p_proj[0] + 1) * width - 1) * 0.5
        py = ((p_proj[1] + 1) * height - 1) * 0.5

        rminx = min(grid_x, max(0, int((px - r_i) / tile)))
        rminy = min(grid_y, max(0, int((py - r_i) / tile)))
        rmaxx = min(grid_x, max(0, int((px + r_i + tile - 1) / tile)))
        rmaxy = min(grid_y, max(0, int((py + r_i + tile - 1) / tile)))
        if (rmaxx - rminx) * (rmaxy - rminy) == 0:
            continue

        mean2d[i] = (px, py)
        conic[i] = conic_i
        depth[i] = p_view[2]
        radius[i] = r_i
        eff_op[i] = opac[i] * h_scale
        rgb[i] = eval_sh(sh_degree, features[i], p - cam_center)
        rects[i] = (rminx, rminy, rmaxx, rmaxy)

        for ty in range(rminy, rmaxy):
            for tx in range(rminx, rmaxx):
                instances.append((ty * grid_x + tx, depth[i], i))

    instances.sort(key=lambda e: (e[0], e[1]))

    color = np.zeros((height, width, 3))
    invdepth = np.zeros((height, width))
    final_t = np.ones((height, width))

    # group instances per tile
    by_tile = {}
    for tid, d, i in instances:
        by_tile.setdefault(tid, []).append(i)

    for tid, ids in by_tile.items():
        tx, ty = tid % grid_x, tid // grid_x
        x0, y0 = tx * tile, ty * tile
        xs = np.arange(x0, min(x0 + tile, width))
        ys = np.arange(y0, min(y0 + tile, height))
        if len(xs) == 0 or len(ys) == 0:
            continue
        pxg, pyg = np.meshgrid(xs, ys)  # (h, w)
        T = np.ones_like(pxg, dtype=np.float64)
        done = np.zeros_like(pxg, dtype=bool)
        C = np.zeros(pxg.shape + (3,))
        ID = np.zeros_like(T)
        for i in ids:
            dx = mean2d[i, 0] - pxg
            dy = mean2d[i, 1] - pyg
            a, b, c = conic[i]
            power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy
            alpha = np.minimum(0.99, eff_op[i] * np.exp(power))
            skip = (power > 0) | (alpha < 1 / 255.0)
            test_t = T * (1 - alpha)
            newly_done = (~skip) & (test_t < 1e-4)
            done = done | newly_done
            blend = (~skip) & (~done)
            w = np.where(blend, alpha * T, 0.0)
            C += w[..., None] * rgb[i][None, None, :]
            ID += w / depth[i]
            T = np.where(blend, test_t, T)
        color[y0 : y0 + len(ys), x0 : x0 + len(xs)] = C + T[..., None] * np.asarray(bg)[None, None, :]
        invdepth[y0 : y0 + len(ys), x0 : x0 + len(xs)] = ID
        final_t[y0 : y0 + len(ys), x0 : x0 + len(xs)] = T

    # background for tiles with no instances
    empty = np.ones((height, width), dtype=bool)
    for tid in by_tile:
        tx, ty = tid % grid_x, tid // grid_x
        empty[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile] = False
    color[empty] = np.asarray(bg)[None, :]

    return {
        "color": color,
        "invdepth": invdepth,
        "final_t": final_t,
        "mean2d": mean2d,
        "conic": conic,
        "depth": depth,
        "radius": radius,
        "rgb": rgb,
        "opacity": eff_op,
        "rects": rects,
        "num_instances": len(instances),
    }


def make_test_scene(rng, n=300, width=64, height=48, sh_degree=2, seed_cam=True):
    """Random but well-conditioned scene + camera for oracle comparisons."""
    k = (sh_degree + 1) ** 2
    xyz = rng.normal(size=(n, 3)) * np.array([1.2, 1.0, 0.8])
    xyz[:, 2] += 0.0
    log_scaling = np.log(rng.uniform(0.02, 0.25, size=(n, 3)))
    rotation = rng.normal(size=(n, 4))
    logit_opacity = rng.normal(size=(n, 1)) * 1.5
    features = rng.normal(size=(n, k, 3)) * 0.4
    features[:, 0, :] = rng.uniform(-1.0, 2.0, size=(n, 3))

    # camera at z=-4 looking down +z (view dir +z)
    R = np.eye(3)
    t = np.array([0.0, 0.0, 4.0])
    from gsplat_tpu.utils.graphics import projection_matrix, world_to_view

    world_view = world_to_view(R, t)
    fov_x, fov_y = 0.9, 0.7
    proj = projection_matrix(0.01, 100.0, fov_x, fov_y)
    full_proj = proj @ world_view
    cam_center = -world_view[:3, :3].T @ world_view[:3, 3]
    return dict(
        xyz=xyz.astype(np.float32),
        log_scaling=log_scaling.astype(np.float32),
        rotation=rotation.astype(np.float32),
        logit_opacity=logit_opacity.astype(np.float32),
        features=features.astype(np.float32),
        world_view=world_view.astype(np.float32),
        full_proj=full_proj.astype(np.float32),
        cam_center=cam_center.astype(np.float32),
        width=width,
        height=height,
        tan_fovx=math.tan(fov_x / 2),
        tan_fovy=math.tan(fov_y / 2),
        sh_degree=sh_degree,
    )
