"""Parameter activations and quaternion/covariance helpers.

Mirrors the reference's activation choices (`scene/gaussian_model.py:32-47`)
and quaternion convention (`utils/general_utils.py:78-110`): quaternions are
wxyz and are normalized by the activation, scales are exponentiated
log-scales, opacities are sigmoided logits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scaling_activation(s):
    return jnp.exp(s)


def scaling_inverse_activation(s):
    return jnp.log(s)


def opacity_activation(o):
    return jax.nn.sigmoid(o)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def normalize_rotation(q, eps: float = 0.0):
    """Unit-normalize quaternions (wxyz), last axis."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)
    return q / norm


def quat_to_rotmat(q):
    """Quaternion (..., 4) wxyz -> rotation matrix (..., 3, 3).

    Same element layout as the reference `build_rotation`
    (`utils/general_utils.py:78-99`); input is normalized here.
    """
    q = normalize_rotation(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z),
            2 * (x * y - r * z),
            2 * (x * z + r * y),
            2 * (x * y + r * z),
            1 - 2 * (x * x + z * z),
            2 * (y * z - r * x),
            2 * (x * z - r * y),
            2 * (y * z + r * x),
            1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_scaling_rotation(scales, quats):
    """L = R @ diag(s): (..., 3, 3), reference `general_utils.py:101-110`."""
    R = quat_to_rotmat(quats)
    return R * scales[..., None, :]


def covariance_from_scaling_rotation(scales, scale_modifier, quats):
    """World-space 3D covariance, upper-triangular 6-vector.

    Sigma = L L^T with L = R diag(s); stored [xx, xy, xz, yy, yz, zz] like
    `strip_symmetric` (`utils/general_utils.py:64-76`). Equal to the CUDA
    `computeCov3D` result (`forward.cu:114-151`, which builds M = S R and
    Sigma = M^T M — the same matrix).

    Written componentwise on (N,) columns: batched (N, 3, 3) matmuls tile to
    (8, 128) per 3x3 on TPU (a ~100x memory blow-up) and dominate the whole
    preprocess stage if expressed as einsum/@.
    """
    q = normalize_rotation(quats)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    s = scale_modifier * scales
    s0, s1, s2 = s[..., 0], s[..., 1], s[..., 2]

    # rows of R (reference `build_rotation` layout), columns scaled by s
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)

    v0, v1, v2 = s0 * s0, s1 * s1, s2 * s2
    # Sigma = R diag(s^2) R^T
    sxx = v0 * r00 * r00 + v1 * r01 * r01 + v2 * r02 * r02
    sxy = v0 * r00 * r10 + v1 * r01 * r11 + v2 * r02 * r12
    sxz = v0 * r00 * r20 + v1 * r01 * r21 + v2 * r02 * r22
    syy = v0 * r10 * r10 + v1 * r11 * r11 + v2 * r12 * r12
    syz = v0 * r10 * r20 + v1 * r11 * r21 + v2 * r12 * r22
    szz = v0 * r20 * r20 + v1 * r21 * r21 + v2 * r22 * r22
    return jnp.stack([sxx, sxy, sxz, syy, syz, szz], axis=-1)
