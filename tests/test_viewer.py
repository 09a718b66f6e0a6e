"""Loopback test of the SIBR network-GUI wire protocol.

Plays the SIBR_remoteGaussian client role against NetworkGUI: sends the
length-prefixed JSON camera message the reference training loop decodes
(`gaussian_renderer/network_gui.py:43-86`) and expects raw H*W*3 bytes plus
the length-prefixed verify string back.
"""

import json
import socket
import threading

import numpy as np
import jax.numpy as jnp
import pytest

from gsplat_tpu.core.types import make_render_settings
from gsplat_tpu.viewer.network_gui import NetworkGUI


def _client_message(width, height, fovx=0.9, fovy=0.7):
    # glm-convention matrices as the SIBR viewer sends them: row-major lists
    # with Y/Z columns flipped relative to math form
    import sys
    sys.path.insert(0, "/root/repo")
    from gsplat_tpu.utils.graphics import projection_matrix, world_to_view

    w2v = world_to_view(np.eye(3), np.array([0.0, 0.0, 4.0]))
    proj = projection_matrix(0.01, 100.0, fovx, fovy)
    vp = (proj @ w2v).astype(np.float32)
    vm_glm = w2v.T.copy()
    vm_glm[:, 1] *= -1
    vm_glm[:, 2] *= -1
    vp_glm = vp.T.copy()
    vp_glm[:, 1] *= -1
    return {
        "resolution_x": width,
        "resolution_y": height,
        "train": True,
        "fov_x": fovx,
        "fov_y": fovy,
        "z_near": 0.01,
        "z_far": 100.0,
        "shs_python": False,
        "rot_scale_python": False,
        "keep_alive": True,
        "scaling_modifier": 1.0,
        "view_matrix": [float(x) for x in vm_glm.reshape(-1)],
        "view_projection_matrix": [float(x) for x in vp_glm.reshape(-1)],
    }


def test_network_gui_loopback(rng):
    from tests.oracle.reference_math import make_test_scene
    from tests.test_forward_vs_oracle import scene_to_inputs

    sc = make_test_scene(rng, n=500, width=64, height=48, sh_degree=1)
    params, _, alive = scene_to_inputs(sc)

    gui = NetworkGUI(port=0)
    port = gui.listener.getsockname()[1]
    settings = make_render_settings(
        sh_degree=1, max_per_tile=256, instance_capacity=1 << 14, backend="jnp"
    )

    width, height = 64, 48
    result = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=30)
        payload = json.dumps(_client_message(width, height)).encode("utf-8")
        s.sendall(len(payload).to_bytes(4, "little"))
        s.sendall(payload)
        want = width * height * 3
        buf = b""
        while len(buf) < want:
            buf += s.recv(want - len(buf))
        n = int.from_bytes(s.recv(4), "little")
        verify = s.recv(n).decode("ascii")
        result["image"] = np.frombuffer(buf, np.uint8).reshape(height, width, 3)
        result["verify"] = verify
        s.close()

    t = threading.Thread(target=client)
    t.start()
    # pump until the connection is accepted and one message served
    for _ in range(200):
        gui.pump(params, alive, settings, jnp.zeros(3), "loopback-src", 1, 10)
        if result:
            break
    t.join(timeout=30)
    gui.close()

    assert result, "viewer round-trip did not complete"
    assert result["verify"] == "loopback-src"
    img = result["image"]
    assert img.shape == (height, width, 3)
    assert img.max() > 0, "render should not be all black"
