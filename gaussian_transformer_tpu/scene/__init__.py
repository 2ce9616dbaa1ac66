"""Scene orchestrator — loads a COLMAP or Blender dataset, builds cameras, and
initializes / restores the GaussianScene.

Parity: ``/root/reference/scene/__init__.py`` — scene-type autodetection,
input-PLY copy + cameras.json dump, camera shuffling, cameras_extent from the
NeRF++ normalization, trained-PLY loading with -1 = latest iteration.
"""

from __future__ import annotations

import json
import os
import random

from gaussian_transformer_tpu.scene.gaussians import GaussianScene
from gaussian_transformer_tpu.scene.cameras import Camera, MiniCam
from gaussian_transformer_tpu.scene.dataset_readers import scene_load_type_callbacks
from gaussian_transformer_tpu.scene.camera_utils import camera_list_from_cam_infos, camera_to_json
from gaussian_transformer_tpu.utils.system import search_for_max_iteration

__all__ = ["Scene", "GaussianScene", "Camera", "MiniCam"]


class Scene:
    gaussians: GaussianScene

    def __init__(
        self,
        args,
        gaussians: GaussianScene = None,
        load_iteration=None,
        shuffle=True,
        resolution_scales=(1.0,),
        capacity=None,
        sh_degree=None,
    ):
        """args needs: model_path, source_path, images, eval, white_background,
        resolution (the ModelParams group)."""
        self.model_path = args.model_path
        self.loaded_iter = None
        sh_degree = sh_degree if sh_degree is not None else getattr(args, "sh_degree", 3)

        if load_iteration:
            if load_iteration == -1:
                self.loaded_iter = search_for_max_iteration(os.path.join(self.model_path, "point_cloud"))
                assert self.loaded_iter is not None, "Could not load iter!"
            else:
                self.loaded_iter = load_iteration
            print("Loading trained model at iteration {}".format(self.loaded_iter))

        self.train_cameras = {}
        self.test_cameras = {}

        if os.path.exists(os.path.join(args.source_path, "sparse")):
            scene_info = scene_load_type_callbacks["Colmap"](args.source_path, args.images, args.eval)
        elif os.path.exists(os.path.join(args.source_path, "transforms_train.json")):
            print("Found transforms_train.json file, assuming Blender data set!")
            scene_info = scene_load_type_callbacks["Blender"](args.source_path, args.white_background, args.eval)
        else:
            raise AssertionError("Could not recognize scene type!")

        if not self.loaded_iter:
            os.makedirs(self.model_path, exist_ok=True)
            with open(scene_info.ply_path, "rb") as src_file, open(
                os.path.join(self.model_path, "input.ply"), "wb"
            ) as dest_file:
                dest_file.write(src_file.read())
            json_cams = []
            camlist = []
            if scene_info.test_cameras:
                camlist.extend(scene_info.test_cameras)
            if scene_info.train_cameras:
                camlist.extend(scene_info.train_cameras)
            for id, cam in enumerate(camlist):
                json_cams.append(camera_to_json(id, cam))
            with open(os.path.join(self.model_path, "cameras.json"), "w") as file:
                json.dump(json_cams, file)

        if shuffle:
            random.shuffle(scene_info.train_cameras)
            random.shuffle(scene_info.test_cameras)

        self.cameras_extent = scene_info.nerf_normalization["radius"]

        for resolution_scale in resolution_scales:
            print("Loading Training Cameras")
            self.train_cameras[resolution_scale] = camera_list_from_cam_infos(
                scene_info.train_cameras, resolution_scale, args
            )
            print("Loading Test Cameras")
            self.test_cameras[resolution_scale] = camera_list_from_cam_infos(
                scene_info.test_cameras, resolution_scale, args
            )

        if self.loaded_iter:
            self.gaussians = GaussianScene.load_ply(
                os.path.join(self.model_path, "point_cloud", f"iteration_{self.loaded_iter}", "point_cloud.ply"),
                max_sh_degree=sh_degree,
                capacity=capacity,
            )
        else:
            assert scene_info.point_cloud is not None, "scene has no initial point cloud"
            self.gaussians = GaussianScene.from_pcd(
                scene_info.point_cloud, max_sh_degree=sh_degree, capacity=capacity
            )

    def save(self, iteration: int) -> None:
        point_cloud_path = os.path.join(self.model_path, f"point_cloud/iteration_{iteration}")
        self.gaussians.save_ply(os.path.join(point_cloud_path, "point_cloud.ply"))

    def get_train_cameras(self, scale=1.0):
        return self.train_cameras[scale]

    def get_test_cameras(self, scale=1.0):
        return self.test_cameras[scale]

    # Reference-spelling aliases.
    getTrainCameras = get_train_cameras
    getTestCameras = get_test_cameras
