"""Cameras.

``Camera`` replaces the reference's ``nn.Module`` camera (``/root/reference/scene/cameras.py:17-57``)
with a JAX pytree: the GT image and the transform matrices are arrays, the
intrinsics are static floats. ``MiniCam`` mirrors the viewer-protocol camera
(cameras.py:59-70).

Matrix convention (identical to the reference): matrices are stored TRANSPOSED
so ``p_cam = [p_world, 1] @ world_view_transform`` and
``p_clip = [p_world, 1] @ full_proj_transform``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from gaussian_transformer_tpu.utils.graphics import get_projection_matrix, get_world2view


@struct.dataclass
class Camera:
    # Static metadata (hashable, not traced).
    uid: int = struct.field(pytree_node=False)
    colmap_id: int = struct.field(pytree_node=False)
    image_name: str = struct.field(pytree_node=False)
    image_width: int = struct.field(pytree_node=False)
    image_height: int = struct.field(pytree_node=False)
    fovx: float = struct.field(pytree_node=False)
    fovy: float = struct.field(pytree_node=False)
    znear: float = struct.field(pytree_node=False, default=0.01)
    zfar: float = struct.field(pytree_node=False, default=100.0)

    # Array data.
    world_view_transform: jnp.ndarray = None  # [4,4] transposed W2C
    full_proj_transform: jnp.ndarray = None  # [4,4] transposed W2C@P
    camera_center: jnp.ndarray = None  # [3]
    original_image: Optional[jnp.ndarray] = None  # [3,H,W] in [0,1]

    @staticmethod
    def create(
        colmap_id: int,
        R: np.ndarray,
        T: np.ndarray,
        fovx: float,
        fovy: float,
        image: Optional[np.ndarray],
        gt_alpha_mask: Optional[np.ndarray],
        image_name: str,
        uid: int,
        width: Optional[int] = None,
        height: Optional[int] = None,
        trans=None,
        scale: float = 1.0,
        znear: float = 0.01,
        zfar: float = 100.0,
    ) -> "Camera":
        if image is not None:
            image = np.clip(np.asarray(image, dtype=np.float32), 0.0, 1.0)
            if gt_alpha_mask is not None:
                image = image * np.asarray(gt_alpha_mask, dtype=np.float32)
            height, width = image.shape[1], image.shape[2]
        assert width is not None and height is not None

        w2c = get_world2view(R, T, trans if trans is not None else np.zeros(3), scale)
        world_view = w2c.T  # transposed storage
        proj = get_projection_matrix(znear, zfar, fovx, fovy).T
        full_proj = world_view @ proj
        cam_center = np.linalg.inv(world_view)[3, :3]

        return Camera(
            uid=uid,
            colmap_id=colmap_id,
            image_name=image_name,
            image_width=int(width),
            image_height=int(height),
            fovx=float(fovx),
            fovy=float(fovy),
            znear=znear,
            zfar=zfar,
            world_view_transform=jnp.asarray(world_view),
            full_proj_transform=jnp.asarray(full_proj),
            camera_center=jnp.asarray(cam_center),
            original_image=jnp.asarray(image) if image is not None else None,
        )

    def anonymize(self) -> "Camera":
        """Strip per-identity static metadata (uid/colmap_id/image_name).

        The static fields are part of the pytree treedef, so every DISTINCT
        camera identity passed into a jitted function creates a fresh trace +
        compile-cache entry that is retained forever — on the 1.9B-param
        campaign that was ~80 MB of host RSS per new camera batch plus a
        multi-second retrace (the "10 GB/h leak"). Call this on any camera
        crossing a jit boundary; geometry and images are untouched.
        """
        return self.replace(uid=0, colmap_id=0, image_name="")

    # Reference-attribute aliases.
    @property
    def FoVx(self):
        return self.fovx

    @property
    def FoVy(self):
        return self.fovy

    @property
    def R(self):
        # Recover the (transposed w2c) rotation the reference stores.
        return np.asarray(self.world_view_transform)[:3, :3]

    @property
    def T(self):
        return np.asarray(self.world_view_transform)[3, :3]


@struct.dataclass
class MiniCam:
    """Lightweight camera built from the viewer wire protocol."""

    image_width: int = struct.field(pytree_node=False)
    image_height: int = struct.field(pytree_node=False)
    fovx: float = struct.field(pytree_node=False)
    fovy: float = struct.field(pytree_node=False)
    znear: float = struct.field(pytree_node=False)
    zfar: float = struct.field(pytree_node=False)
    world_view_transform: jnp.ndarray = None
    full_proj_transform: jnp.ndarray = None
    camera_center: jnp.ndarray = None

    @staticmethod
    def create(width, height, fovy, fovx, znear, zfar, world_view_transform, full_proj_transform) -> "MiniCam":
        view_inv = np.linalg.inv(np.asarray(world_view_transform))
        return MiniCam(
            image_width=int(width),
            image_height=int(height),
            fovx=float(fovx),
            fovy=float(fovy),
            znear=float(znear),
            zfar=float(zfar),
            world_view_transform=jnp.asarray(world_view_transform, dtype=jnp.float32),
            full_proj_transform=jnp.asarray(full_proj_transform, dtype=jnp.float32),
            camera_center=jnp.asarray(view_inv[3, :3], dtype=jnp.float32),
        )

    @property
    def FoVx(self):
        return self.fovx

    @property
    def FoVy(self):
        return self.fovy
