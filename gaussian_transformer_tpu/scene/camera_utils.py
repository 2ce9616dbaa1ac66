"""Camera loading helpers: resolution logic + JSON export.

Parity: ``/root/reference/utils/camera_utils.py`` — the -1 auto-downscale of
>1600px-wide images, the [1,2,4,8] divisor path, and the cameras.json schema.
"""

from __future__ import annotations

import numpy as np

from gaussian_transformer_tpu.scene.cameras import Camera
from gaussian_transformer_tpu.utils.general import pil_to_array
from gaussian_transformer_tpu.utils.graphics import fov2focal

WARNED = False


def load_cam(args, id, cam_info, resolution_scale) -> Camera:
    if cam_info.image is None:
        # Image file missing (e.g. stripped smoke datasets): geometry-only camera.
        return Camera.create(
            colmap_id=cam_info.uid,
            R=cam_info.R,
            T=cam_info.T,
            fovx=cam_info.FovX,
            fovy=cam_info.FovY,
            image=None,
            gt_alpha_mask=None,
            image_name=cam_info.image_name,
            uid=id,
            width=cam_info.width,
            height=cam_info.height,
        )

    orig_w, orig_h = cam_info.image.size

    if args.resolution in [1, 2, 4, 8]:
        resolution = (
            round(orig_w / (resolution_scale * args.resolution)),
            round(orig_h / (resolution_scale * args.resolution)),
        )
    else:
        if args.resolution == -1:
            if orig_w > 1600:
                global WARNED
                if not WARNED:
                    print(
                        "[ INFO ] Encountered quite large input images (>1.6K pixels width), "
                        "rescaling to 1.6K.\n If this is not desired, please explicitly "
                        "specify '--resolution/-r' as 1"
                    )
                    WARNED = True
                global_down = orig_w / 1600
            else:
                global_down = 1
        else:
            global_down = orig_w / args.resolution
        scale = float(global_down) * float(resolution_scale)
        resolution = (int(orig_w / scale), int(orig_h / scale))

    resized_rgb = pil_to_array(cam_info.image, resolution)
    gt_image = resized_rgb[:3, ...]
    loaded_mask = resized_rgb[3:4, ...] if resized_rgb.shape[0] == 4 else None

    return Camera.create(
        colmap_id=cam_info.uid,
        R=cam_info.R,
        T=cam_info.T,
        fovx=cam_info.FovX,
        fovy=cam_info.FovY,
        image=gt_image,
        gt_alpha_mask=loaded_mask,
        image_name=cam_info.image_name,
        uid=id,
    )


def camera_list_from_cam_infos(cam_infos, resolution_scale, args):
    return [load_cam(args, id, c, resolution_scale) for id, c in enumerate(cam_infos)]


def camera_to_json(id, camera) -> dict:
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = camera.R.transpose()
    Rt[:3, 3] = camera.T
    Rt[3, 3] = 1.0
    W2C = np.linalg.inv(Rt)
    pos = W2C[:3, 3]
    rot = W2C[:3, :3]
    return {
        "id": id,
        "img_name": camera.image_name,
        "width": camera.width,
        "height": camera.height,
        "position": pos.tolist(),
        "rotation": [x.tolist() for x in rot],
        "fy": fov2focal(camera.FovY, camera.height),
        "fx": fov2focal(camera.FovX, camera.width),
    }
