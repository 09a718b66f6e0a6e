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
    """
    L = build_scaling_rotation(scale_modifier * scales, quats)
    sigma = L @ jnp.swapaxes(L, -1, -2)
    return jnp.stack(
        [
            sigma[..., 0, 0],
            sigma[..., 0, 1],
            sigma[..., 0, 2],
            sigma[..., 1, 1],
            sigma[..., 1, 2],
            sigma[..., 2, 2],
        ],
        axis=-1,
    )
