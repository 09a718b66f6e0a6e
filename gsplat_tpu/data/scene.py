"""Scene container: dataset dispatch, camera lists, model snapshots.

The reference `scene.Scene` (`scene/__init__.py:25-99`) couples dataset
loading with GaussianModel construction; here the Scene owns only the data
side (cameras + initial point cloud + extent) and snapshot I/O, keeping the
model itself a pure pytree.
"""

from __future__ import annotations

import json
import os
import random
import shutil

import numpy as np

from gsplat_tpu.data import ply as ply_io
from gsplat_tpu.data.cameras import LoadedCamera, camera_to_json, load_camera
from gsplat_tpu.data.readers import read_scene_info


class Scene:
    def __init__(
        self,
        source_path: str,
        model_path: str | None = None,
        images: str | None = None,
        depths: str = "",
        resolution: int = -1,
        white_background: bool = False,
        eval: bool = False,
        train_test_exp: bool = False,
        shuffle: bool = True,
        resolution_scales=(1.0,),
        seed: int = 0,
    ):
        self.source_path = source_path
        self.model_path = model_path
        self.train_test_exp = train_test_exp

        info = read_scene_info(
            source_path,
            images=images,
            depths=depths,
            eval=eval,
            train_test_exp=train_test_exp,
            white_background=white_background,
        )
        self.info = info
        self.cameras_extent = info.nerf_normalization["radius"]
        self.is_nerf_synthetic = info.is_nerf_synthetic

        if model_path:
            os.makedirs(model_path, exist_ok=True)
            if info.ply_path and os.path.exists(info.ply_path):
                shutil.copyfile(info.ply_path, os.path.join(model_path, "input.ply"))
            cam_json = []

        train_infos = list(info.train_cameras)
        test_infos = list(info.test_cameras)
        if shuffle:
            # camera shuffle like `scene/__init__.py:65-67` (fixed seed for
            # reproducibility; the reference relies on safe_state's seed 0)
            random.Random(seed).shuffle(train_infos)
            random.Random(seed).shuffle(test_infos)

        self.train_cameras: dict[float, list[LoadedCamera]] = {}
        self.test_cameras: dict[float, list[LoadedCamera]] = {}
        for scale in resolution_scales:
            self.train_cameras[scale] = [
                load_camera(
                    ci, uid=i, resolution=resolution, resolution_scale=scale,
                    is_nerf_synthetic=info.is_nerf_synthetic, is_test_dataset=False,
                    train_test_exp=train_test_exp, white_background=white_background,
                )
                for i, ci in enumerate(train_infos)
            ]
            self.test_cameras[scale] = [
                load_camera(
                    ci, uid=i, resolution=resolution, resolution_scale=scale,
                    is_nerf_synthetic=info.is_nerf_synthetic, is_test_dataset=True,
                    train_test_exp=train_test_exp, white_background=white_background,
                )
                for i, ci in enumerate(test_infos)
            ]

        if model_path:
            for cam in self.train_cameras.get(1.0, []) + self.test_cameras.get(1.0, []):
                cam_json.append(camera_to_json(cam.uid, cam))
            with open(os.path.join(model_path, "cameras.json"), "w") as f:
                json.dump(cam_json, f)

    def get_train_cameras(self, scale: float = 1.0):
        return self.train_cameras[scale]

    def get_test_cameras(self, scale: float = 1.0):
        return self.test_cameras[scale]

    def save(self, iteration: int, params, alive, exposure=None, image_names=None):
        """Model snapshot: reference-layout PLY + exposure.json
        (`scene/__init__.py:85-94`)."""
        assert self.model_path, "Scene needs model_path to save snapshots"
        pc_dir = os.path.join(self.model_path, f"point_cloud/iteration_{iteration}")
        os.makedirs(pc_dir, exist_ok=True)
        keep = np.asarray(alive)
        ply_io.save_gaussian_ply(
            os.path.join(pc_dir, "point_cloud.ply"),
            np.asarray(params.xyz)[keep],
            np.asarray(params.features_dc)[keep],
            np.asarray(params.features_rest)[keep],
            np.asarray(params.opacity)[keep],
            np.asarray(params.scaling)[keep],
            np.asarray(params.rotation)[keep],
        )
        if exposure is not None:
            names = image_names or [c.image_name for c in self.get_train_cameras()]
            exp = np.asarray(exposure)
            mapping = {nm: exp[i].tolist() for i, nm in enumerate(names[: exp.shape[0]])}
            with open(os.path.join(self.model_path, "exposure.json"), "w") as f:
                json.dump(mapping, f, indent=2)
