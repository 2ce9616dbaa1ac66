"""Per-Gaussian projection: world -> screen, EWA splatting math.

This is the TPU-native equivalent of the preprocess stage of the reference's CUDA
rasterizer (``diff-gaussian-rasterization``, consumed at
``/root/reference/gaussian_renderer/__init__.py:85-93``). The math follows the
published 3DGS EWA formulation the CUDA kernel implements:

  * mean projection through the (transposed) full projection matrix,
  * near-plane cull at z <= 0.2,
  * 3D covariance from activated scale + quaternion (L L^T),
  * perspective Jacobian J and view rotation W: cov2D = J W Sigma W^T J^T,
  * +0.3 low-pass dilation on the 2D covariance diagonal,
  * conic = cov2D^{-1}, radius = ceil(3 * sqrt(max eigenvalue)),
  * SH -> RGB with the clamp-to-positive shift.

Everything is vectorized jnp over the static capacity axis — no Pallas needed
here; XLA fuses this elementwise pipeline into a handful of VPU loops. Invalid /
culled Gaussians get radius 0 and opacity 0 so downstream stages can mask on
radius alone.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from gaussian_transformer_tpu.utils.graphics import build_covariance_3d
from gaussian_transformer_tpu.utils.sh import eval_sh


class Projected(NamedTuple):
    """Screen-space per-Gaussian quantities (capacity-length arrays)."""

    means2d: jnp.ndarray  # [C, 2] pixel coords
    depths: jnp.ndarray  # [C]
    conics: jnp.ndarray  # [C, 3] upper-tri of inverse 2D covariance (a, b, c)
    radii: jnp.ndarray  # [C] int32 screen-space radius, 0 = culled
    rgbs: jnp.ndarray  # [C, 3] view-dependent color
    opacities: jnp.ndarray  # [C] activated opacity
    # Effective binning radius <= radii: beyond it alpha < 1/255 everywhere, so
    # tiles outside contribute nothing (every pixel hits the upstream skip
    # rule). Binning with it sheds instances exactly; ``radii`` keeps the
    # reference's 3-sigma contract for visibility/densification stats.
    radii_bin: jnp.ndarray  # [C] int32


def ndc_to_pixel(ndc, size):
    """((ndc + 1) * size - 1) / 2 — the CUDA rasterizer's pixel mapping."""
    return ((ndc + 1.0) * size - 1.0) * 0.5


def compute_cov2d(
    mean_view: jnp.ndarray,
    cov3d: jnp.ndarray,
    focal_x: float,
    focal_y: float,
    tan_fovx: float,
    tan_fovy: float,
    view_rot: jnp.ndarray,
):
    """EWA projection of the 3D covariance to 2D (upstream computeCov2D behavior).

    Args:
      mean_view: [C, 3] means in camera space.
      cov3d: [C, 3, 3] full world-space covariance.
      view_rot: [3, 3] world->camera rotation (rows of the view matrix).

    Returns [C, 3] packed 2D covariance (xx, xy, yy) WITH the +0.3 dilation.
    """
    tz = mean_view[:, 2]
    # Clamp the in-frustum position used by the Jacobian (limits the linearization).
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txtz = jnp.clip(mean_view[:, 0] / tz, -limx, limx)
    tytz = jnp.clip(mean_view[:, 1] / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(tz)
    # J: [C, 2, 3] (only the two rows that survive into the 2x2 block).
    j_row0 = jnp.stack([focal_x * inv_z, zeros, -focal_x * tx * inv_z2], axis=-1)
    j_row1 = jnp.stack([zeros, focal_y * inv_z, -focal_y * ty * inv_z2], axis=-1)
    J = jnp.stack([j_row0, j_row1], axis=-2)

    # T = J @ W; cov2d = T @ Sigma @ T^T  (2x2).
    T = J @ view_rot[None, :, :]
    cov = T @ cov3d @ jnp.swapaxes(T, -1, -2)

    cov_xx = cov[:, 0, 0] + 0.3
    cov_yy = cov[:, 1, 1] + 0.3
    cov_xy = cov[:, 0, 1]
    return jnp.stack([cov_xx, cov_xy, cov_yy], axis=-1)


def project_gaussians(
    xyz: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: Optional[jnp.ndarray],
    colors_precomp: Optional[jnp.ndarray],
    *,
    world_view_transform: jnp.ndarray,
    full_proj_transform: jnp.ndarray,
    camera_center: jnp.ndarray,
    image_width: int,
    image_height: int,
    tan_fovx: float,
    tan_fovy: float,
    active_sh_degree: int,
    scaling_modifier: float = 1.0,
    cov3d_precomp: Optional[jnp.ndarray] = None,
) -> Projected:
    """Vectorized projection of all (capacity) Gaussians for one camera.

    ``scales``/``rotations``/``opacities`` are the ACTIVATED values
    (exp / normalized / sigmoid·alive). Matrices use the reference's transposed
    row-vector convention (``scene/cameras.py``).
    """
    C = xyz.shape[0]
    focal_x = image_width / (2.0 * tan_fovx)
    focal_y = image_height / (2.0 * tan_fovy)

    ones = jnp.ones((C, 1), dtype=xyz.dtype)
    xyz_h = jnp.concatenate([xyz, ones], axis=1)

    # Camera-space position and clip-space projection.
    p_view = xyz_h @ world_view_transform  # [C, 4]
    p_hom = xyz_h @ full_proj_transform  # [C, 4]
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]

    depths = p_view[:, 2]
    in_front = depths > 0.2  # upstream in_frustum near cull

    mean_x = ndc_to_pixel(p_proj[:, 0], image_width)
    mean_y = ndc_to_pixel(p_proj[:, 1], image_height)
    means2d = jnp.stack([mean_x, mean_y], axis=-1)

    # 3D covariance (world space).
    if cov3d_precomp is not None:
        cov3d = cov3d_precomp
    else:
        cov3d = build_covariance_3d(scales, rotations, scaling_modifier)

    view_rot = world_view_transform[:3, :3].T  # rows of W2C = world->cam rotation
    safe_depth = jnp.where(in_front, depths, 1.0)
    p_view_safe = jnp.concatenate([p_view[:, :2], safe_depth[:, None]], axis=1)
    cov2d = compute_cov2d(p_view_safe, cov3d, focal_x, focal_y, tan_fovx, tan_fovy, view_rot)

    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    valid_det = det != 0.0
    det_safe = jnp.where(valid_det, det, 1.0)
    det_inv = 1.0 / det_safe
    conics = jnp.stack(
        [cov2d[:, 2] * det_inv, -cov2d[:, 1] * det_inv, cov2d[:, 0] * det_inv], axis=-1
    )

    # Screen-space radius from the larger eigenvalue (3 sigma).
    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    sqrt_l1 = jnp.sqrt(jnp.maximum(lambda1, 0.0))
    radius_f = jnp.ceil(3.0 * sqrt_l1)

    visible = in_front & valid_det
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    # Effective radius where alpha can still reach 1/255: alpha <= opac *
    # exp(-0.5 d^2 / lambda1), so d >= sqrt(2 ln(255 opac) lambda1) implies
    # alpha < 1/255 (the skip rule) — +1 px guards the boundary. Low-opacity
    # splats shed most of their 3-sigma tile coverage with zero image change.
    ln_term = jnp.log(jnp.maximum(255.0 * opacities, 1.0))
    r_eff = jnp.ceil(jnp.sqrt(2.0 * ln_term) * sqrt_l1) + 1.0
    radii_bin = jnp.minimum(radii, jnp.where(visible, r_eff, 0.0).astype(jnp.int32))

    # Color: precomputed override or SH evaluated along the view direction.
    if colors_precomp is not None:
        rgbs = colors_precomp
    else:
        assert shs is not None
        dirs = xyz - camera_center[None, :]
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        # shs: [C, K, 3] -> eval over channel-last layout [C, 3, K].
        raw = eval_sh(active_sh_degree, jnp.swapaxes(shs, -1, -2), dirs) + 0.5
        rgbs = jnp.maximum(raw, 0.0)  # clamp-to-positive, matching the CUDA path

    opac = jnp.where(visible, opacities, 0.0)
    return Projected(
        means2d=means2d,
        depths=depths,
        conics=conics,
        radii=radii,
        rgbs=rgbs,
        opacities=opac,
        radii_bin=radii_bin,
    )
