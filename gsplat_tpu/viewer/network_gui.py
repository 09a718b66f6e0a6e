"""SIBR remote-viewer bridge — wire-compatible with the reference protocol.

Same TCP format as `gaussian_renderer/network_gui.py:24-86`: non-blocking
listener; requests are 4-byte little-endian length-prefixed JSON carrying the
viewer camera (glm-convention matrices with Y/Z column flips) + training
toggles; responses are raw H*W*3 bytes followed by the length-prefixed
source-path string. A reference SIBR_remoteGaussian_app can therefore attach
to a gsplat_tpu training run unmodified.
"""

from __future__ import annotations

import json
import socket
import traceback

import numpy as np


class NetworkGUI:
    def __init__(self, host="127.0.0.1", port=6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn = None
        self._render_cache = {}
        print(f"[viewer] listening on {host}:{port}")

    def try_connect(self):
        try:
            self.conn, addr = self.listener.accept()
            print(f"\n[viewer] connected by {addr}")
            self.conn.settimeout(None)
        except (BlockingIOError, OSError):
            pass

    def _read(self):
        n = int.from_bytes(self.conn.recv(4), "little")
        return json.loads(self.conn.recv(n).decode("utf-8"))

    def _send(self, image_bytes, verify: str):
        if image_bytes is not None:
            self.conn.sendall(image_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))

    def receive(self):
        """Decode one viewer request -> (camera dict | None, toggles)."""
        msg = self._read()
        width, height = msg["resolution_x"], msg["resolution_y"]
        if width == 0 or height == 0:
            return None, None, None, None
        # glm row-vector matrices with Y/Z flips -> math-form (transpose)
        vm = np.array(msg["view_matrix"], np.float32).reshape(4, 4)
        vm[:, 1] *= -1
        vm[:, 2] *= -1
        vp = np.array(msg["view_projection_matrix"], np.float32).reshape(4, 4)
        vp[:, 1] *= -1
        cam = dict(
            width=width,
            height=height,
            fovx=msg["fov_x"],
            fovy=msg["fov_y"],
            world_view=vm.T,
            full_proj=vp.T,
        )
        return (
            cam,
            bool(msg["train"]),
            bool(msg["keep_alive"]),
            float(msg["scaling_modifier"]),
        )

    def _render(self, cam, params, alive, settings_base, bg, scaling_modifier):
        import jax
        import jax.numpy as jnp

        from gsplat_tpu.core.types import Camera, make_render_settings
        from gsplat_tpu.render import render

        key = (cam["width"], cam["height"], settings_base.sh_degree)
        if key not in self._render_cache:
            settings = make_render_settings(
                sh_degree=settings_base.sh_degree,
                instance_capacity=settings_base.instance_capacity,
                max_per_tile=settings_base.max_per_tile,
                antialiasing=settings_base.antialiasing,
                backend=settings_base.backend,
            )
            self._render_cache[key] = jax.jit(
                lambda c, p, a, b, sm: render(
                    c, p, a, settings.replace(scale_modifier=sm), b
                )["render"]
            )
        wv = cam["world_view"]
        camera = Camera(
            world_view=jnp.asarray(wv),
            full_proj=jnp.asarray(cam["full_proj"]),
            camera_center=jnp.asarray(np.linalg.inv(wv)[:3, 3]),
            tan_fovx=jnp.float32(np.tan(cam["fovx"] * 0.5)),
            tan_fovy=jnp.float32(np.tan(cam["fovy"] * 0.5)),
            width=cam["width"],
            height=cam["height"],
        )
        img = self._render_cache[key](
            camera, params, alive, bg, jnp.float32(scaling_modifier)
        )
        return memoryview(
            (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
        )

    def pump(self, params, alive, settings, bg, source_path, iteration, max_iter):
        """One message-loop pass; call once per training iteration
        (`train.py:74-87` equivalent)."""
        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                cam, do_training, keep_alive, scaling_mod = self.receive()
                img_bytes = None
                if cam is not None:
                    img_bytes = self._render(cam, params, alive, settings, bg, scaling_mod)
                self._send(img_bytes, source_path)
                if do_training and (iteration < max_iter or not keep_alive):
                    break
            except Exception:
                traceback.print_exc()
                self.conn = None

    def make_training_hook(self, model_cfg, pipe_cfg):
        from gsplat_tpu.core.types import make_render_settings

        import jax.numpy as jnp

        settings = make_render_settings(
            sh_degree=model_cfg.sh_degree,
            # GUI cameras are user-driven, so there is nothing to probe ahead
            # of time — fall back to a generous fixed capacity under the
            # auto (0) config
            instance_capacity=pipe_cfg.instance_capacity or (1 << 21),
            max_per_tile=pipe_cfg.max_per_tile,
            antialiasing=pipe_cfg.antialiasing,
            backend=pipe_cfg.backend,
        )
        bg = jnp.ones(3) if model_cfg.white_background else jnp.zeros(3)

        def hook(iteration, state, metrics):
            self.pump(
                state.params, state.alive, settings, bg,
                model_cfg.source_path, iteration, 10**9,
            )

        return hook

    def close(self):
        if self.conn is not None:
            self.conn.close()
        self.listener.close()
