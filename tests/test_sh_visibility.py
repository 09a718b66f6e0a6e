"""SH degree-4 band vs the reference python polynomials (`sh_utils.py:57-112`)
and the markVisible frustum test (`rasterize_points.cu:225-244`)."""

import numpy as np

import jax
import jax.numpy as jnp

from gsplat_tpu.core import sh as sh_lib
from gsplat_tpu.render import mark_visible
from tests.oracle.reference_math import make_test_scene
from tests.test_forward_vs_oracle import scene_to_inputs

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396]
C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435]
C4 = [2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
      -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
      0.47308734787878004, -1.7701307697799304, 0.6258357354491761]


def ref_eval_sh(deg, sh, dirs):
    """numpy transcription of the reference eval_sh (`sh_utils.py:57-112`)."""
    result = C0 * sh[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (result - C1 * y[..., 0] * sh[..., 1]
                  + C1 * z[..., 0] * sh[..., 2] - C1 * x[..., 0] * sh[..., 3])
        if deg > 1:
            x, y, z = x[..., 0], y[..., 0], z[..., 0]
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result + C2[0] * xy * sh[..., 4]
                      + C2[1] * yz * sh[..., 5]
                      + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
                      + C2[3] * xz * sh[..., 7]
                      + C2[4] * (xx - yy) * sh[..., 8])
            if deg > 2:
                result = (result + C3[0] * y * (3 * xx - yy) * sh[..., 9]
                          + C3[1] * xy * z * sh[..., 10]
                          + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
                          + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
                          + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
                          + C3[5] * z * (xx - yy) * sh[..., 14]
                          + C3[6] * x * (xx - 3 * yy) * sh[..., 15])
                if deg > 3:
                    result = (result + C4[0] * xy * (xx - yy) * sh[..., 16]
                              + C4[1] * yz * (3 * xx - yy) * sh[..., 17]
                              + C4[2] * xy * (7 * zz - 1) * sh[..., 18]
                              + C4[3] * yz * (7 * zz - 3) * sh[..., 19]
                              + C4[4] * (zz * (35 * zz - 30) + 3) * sh[..., 20]
                              + C4[5] * xz * (7 * zz - 3) * sh[..., 21]
                              + C4[6] * (xx - yy) * (7 * zz - 1) * sh[..., 22]
                              + C4[7] * xz * (xx - 3 * yy) * sh[..., 23]
                              + C4[8] * (xx * (xx - 3 * yy)
                                         - yy * (3 * xx - yy)) * sh[..., 24])
    return result


def test_sh_degree4_matches_reference():
    rng = np.random.default_rng(3)
    n = 500
    dirs = rng.normal(0, 1, (n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    coeffs = rng.normal(0, 0.3, (n, 25, 3)).astype(np.float32)

    for deg in range(5):
        got, _ = sh_lib.eval_sh_color(deg, jnp.asarray(coeffs), jnp.asarray(dirs))
        want = np.stack(
            [ref_eval_sh(deg, coeffs[:, :, c], dirs) for c in range(3)], axis=-1
        ) + 0.5
        np.testing.assert_allclose(
            np.asarray(got), np.maximum(want, 0.0), rtol=2e-5, atol=2e-6,
            err_msg=f"degree {deg}",
        )


def test_mark_visible_matches_near_cull():
    sc = make_test_scene(np.random.default_rng(8), n=800)
    params, camera, alive = scene_to_inputs(sc)
    # push some points behind the camera so both branches are exercised
    import jax.numpy as jnp
    xyz = np.asarray(params.xyz).copy()
    xyz[::5] -= 20.0 * np.asarray(camera.world_view)[2, :3]
    params = params.replace(xyz=jnp.asarray(xyz))
    vis = np.asarray(mark_visible(params.xyz, camera))
    # oracle: view-space z > 0.2 (in_frustum with disabled xy checks,
    # auxiliary.h:151-176)
    wv = np.asarray(camera.world_view)
    z = np.asarray(params.xyz) @ wv[2, :3] + wv[2, 3]
    np.testing.assert_array_equal(vis, z > 0.2)
    assert 0 < vis.sum() < len(vis), "test scene should mix visible/culled"
