"""Camera / geometry math.

Parity targets: ``/root/reference/utils/graphics_utils.py`` (world2view and OpenGL-ish
projection matrix conventions, fov<->focal) and ``/root/reference/utils/general_utils.py:78-110``
(quaternion -> rotation matrix, scaling-rotation factor L).

Conventions (identical to the reference so trained PLYs / viewer protocol interop):
  * Matrices handed to the renderer are stored TRANSPOSED (row-vector convention):
    ``p_cam = [p_world, 1] @ world_view_transform``.
  * Projection is the reference's z in [0, zfar/(zfar-znear)] variant.
  * Quaternions are (w, x, y, z), normalized inside build_rotation.

Everything here is jnp-first and jit/vmap-safe; numpy arrays also work for the
host-side (scene-loading) paths.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class BasicPointCloud(NamedTuple):
    points: np.ndarray
    colors: np.ndarray
    normals: np.ndarray


def get_world2view(R: np.ndarray, t: np.ndarray, translate=None, scale: float = 1.0) -> np.ndarray:
    """World->camera 4x4 (numpy, host-side). Matches getWorld2View2.

    R is the camera-to-world rotation as stored by the COLMAP reader (transposed
    world-to-camera), t the world-to-camera translation.
    """
    if translate is None:
        translate = np.zeros(3)
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0

    C2W = np.linalg.inv(Rt)
    cam_center = C2W[:3, 3]
    cam_center = (cam_center + translate) * scale
    C2W[:3, 3] = cam_center
    Rt = np.linalg.inv(C2W)
    return np.float32(Rt)


def get_projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection 4x4 (pre-transpose layout), reference graphics_utils.py:52-77."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)

    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right

    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def build_rotation(q):
    """Quaternion(s) (w,x,y,z) -> rotation matrix [..., 3, 3] (normalizes first).

    jnp implementation of the reference build_rotation (general_utils.py:78-98).
    """
    q = jnp.asarray(q)
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / jnp.maximum(norm, 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]

    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def build_scaling_rotation(s, q):
    """L = R @ diag(s) with q a (w,x,y,z) quaternion; [..., 3, 3].

    Covariance is then L @ L^T (reference general_utils.py:100-110 +
    gaussian_model.py:27-31).
    """
    R = build_rotation(q)
    return R * s[..., None, :]  # R @ diag(s): scale columns.


def build_covariance_3d(scaling, rotation, scaling_modifier=1.0):
    """Full 3D covariance [..., 3, 3] from activated scales + quaternion."""
    L = build_scaling_rotation(scaling_modifier * scaling, rotation)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(cov):
    """[..., 3, 3] symmetric -> packed upper triangle [..., 6] (reference order:
    xx, xy, xz, yy, yz, zz — general_utils.py:64-76)."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2], cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]],
        axis=-1,
    )
