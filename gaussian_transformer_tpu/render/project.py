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

Layout note (measured on-chip, round 4): the whole stage is structure-of-
arrays — every intermediate is a rank-1 [C] column, and the tiny per-Gaussian
matrices (quat rotation, J, T = J@W, Sigma) are expanded into explicit
scalar-component arithmetic instead of batched [C,3,3]/[C,2,3] matmuls.
Batched tiny matmuls force XLA:TPU into lane-padded layouts/loops for the
size-3 minor dimensions; at 1M Gaussians the matrix form measured 28 ms for
this stage, the SoA form removes the padded traffic entirely. No Pallas
needed; XLA fuses the [C] columns into a handful of VPU loops.

Invalid / culled Gaussians get radius 0 and opacity 0 so downstream stages can
mask on radius alone.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from gaussian_transformer_tpu.utils.sh import C0, C1


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
    # Per-axis ellipse-bbox binning extents [C, 2] (<= radii_bin each axis);
    # exact by the conditional-variance bound — see the projection body.
    rect_bin: jnp.ndarray  # [C, 2] int32


def ndc_to_pixel(ndc, size):
    """((ndc + 1) * size - 1) / 2 — the CUDA rasterizer's pixel mapping."""
    return ((ndc + 1.0) * size - 1.0) * 0.5


def _cov3d_cols(scales, rotations, scaling_modifier):
    """Six unique world-covariance entries as [C] columns.

    Sigma = M M^T with M = R(q) diag(s) — the expansion of
    utils.graphics.build_covariance_3d (scene/gaussian_model.py:27-31
    semantics) without the [C, 3, 3] intermediates.
    """
    r, x, y, z = rotations[:, 0], rotations[:, 1], rotations[:, 2], rotations[:, 3]
    s0 = scaling_modifier * scales[:, 0]
    s1 = scaling_modifier * scales[:, 1]
    s2 = scaling_modifier * scales[:, 2]

    # Rotation matrix entries (same formula as utils.graphics.quat_to_rotmat).
    R00 = 1 - 2 * (y * y + z * z)
    R01 = 2 * (x * y - r * z)
    R02 = 2 * (x * z + r * y)
    R10 = 2 * (x * y + r * z)
    R11 = 1 - 2 * (x * x + z * z)
    R12 = 2 * (y * z - r * x)
    R20 = 2 * (x * z - r * y)
    R21 = 2 * (y * z + r * x)
    R22 = 1 - 2 * (x * x + y * y)

    # M = R diag(s): M_ij = R_ij * s_j. Sigma_ab = sum_j M_aj M_bj.
    M00, M01, M02 = R00 * s0, R01 * s1, R02 * s2
    M10, M11, M12 = R10 * s0, R11 * s1, R12 * s2
    M20, M21, M22 = R20 * s0, R21 * s1, R22 * s2

    Sxx = M00 * M00 + M01 * M01 + M02 * M02
    Sxy = M00 * M10 + M01 * M11 + M02 * M12
    Sxz = M00 * M20 + M01 * M21 + M02 * M22
    Syy = M10 * M10 + M11 * M11 + M12 * M12
    Syz = M10 * M20 + M11 * M21 + M12 * M22
    Szz = M20 * M20 + M21 * M21 + M22 * M22
    return Sxx, Sxy, Sxz, Syy, Syz, Szz


def compute_cov2d_cols(
    tx_raw, ty_raw, tz,
    Sigma,  # 6-tuple of [C] columns (xx, xy, xz, yy, yz, zz)
    focal_x: float, focal_y: float, tan_fovx: float, tan_fovy: float,
    view_rot: jnp.ndarray,
):
    """EWA projection of the 3D covariance to 2D (upstream computeCov2D
    behavior), fully SoA: returns (cov_xx, cov_xy, cov_yy) [C] columns WITH
    the +0.3 dilation.

    ``view_rot`` is the static [3, 3] world->camera rotation; its nine scalar
    entries multiply [C] columns, so no batched matmul is emitted.
    """
    Sxx, Sxy, Sxz, Syy, Syz, Szz = Sigma
    # Clamp the in-frustum position used by the Jacobian (limits linearization).
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txtz = jnp.clip(tx_raw / tz, -limx, limx)
    tytz = jnp.clip(ty_raw / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows (the two surviving rows): J0 = [fx/z, 0, -fx tx/z^2],
    # J1 = [0, fy/z, -fy ty/z^2].
    j00 = focal_x * inv_z
    j02 = -focal_x * tx * inv_z2
    j11 = focal_y * inv_z
    j12 = -focal_y * ty * inv_z2

    # T = J @ W with W = view_rot (static scalars W[k, j]).
    W = view_rot
    T00 = j00 * W[0, 0] + j02 * W[2, 0]
    T01 = j00 * W[0, 1] + j02 * W[2, 1]
    T02 = j00 * W[0, 2] + j02 * W[2, 2]
    T10 = j11 * W[1, 0] + j12 * W[2, 0]
    T11 = j11 * W[1, 1] + j12 * W[2, 1]
    T12 = j11 * W[1, 2] + j12 * W[2, 2]

    # cov = T Sigma T^T, expanded through U = T Sigma (rows of U as columns).
    U00 = T00 * Sxx + T01 * Sxy + T02 * Sxz
    U01 = T00 * Sxy + T01 * Syy + T02 * Syz
    U02 = T00 * Sxz + T01 * Syz + T02 * Szz
    U10 = T10 * Sxx + T11 * Sxy + T12 * Sxz
    U11 = T10 * Sxy + T11 * Syy + T12 * Syz
    U12 = T10 * Sxz + T11 * Syz + T12 * Szz

    cov_xx = U00 * T00 + U01 * T01 + U02 * T02 + 0.3
    cov_xy = U00 * T10 + U01 * T11 + U02 * T12
    cov_yy = U10 * T10 + U11 * T11 + U12 * T12 + 0.3
    return cov_xx, cov_xy, cov_yy


def compute_cov2d(mean_view, cov3d, focal_x, focal_y, tan_fovx, tan_fovy, view_rot):
    """Matrix-form wrapper kept for tests/back-compat: [C, 3] packed
    (xx, xy, yy) from [C, 3] camera-space means and [C, 3, 3] covariance."""
    Sigma = (
        cov3d[:, 0, 0], cov3d[:, 0, 1], cov3d[:, 0, 2],
        cov3d[:, 1, 1], cov3d[:, 1, 2], cov3d[:, 2, 2],
    )
    cov_xx, cov_xy, cov_yy = compute_cov2d_cols(
        mean_view[:, 0], mean_view[:, 1], mean_view[:, 2], Sigma,
        focal_x, focal_y, tan_fovx, tan_fovy, view_rot,
    )
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
    focal_x = image_width / (2.0 * tan_fovx)
    focal_y = image_height / (2.0 * tan_fovy)

    px, py, pz = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    Wv = world_view_transform  # [4, 4], row-vector convention: p @ W
    Fp = full_proj_transform

    def affine(M, j):
        return px * M[0, j] + py * M[1, j] + pz * M[2, j] + M[3, j]

    view_x = affine(Wv, 0)
    view_y = affine(Wv, 1)
    depths = affine(Wv, 2)

    hom_x = affine(Fp, 0)
    hom_y = affine(Fp, 1)
    hom_w = affine(Fp, 3)
    p_w = 1.0 / (hom_w + 1e-7)

    in_front = depths > 0.2  # upstream in_frustum near cull

    mean_x = ndc_to_pixel(hom_x * p_w, image_width)
    mean_y = ndc_to_pixel(hom_y * p_w, image_height)

    # 3D covariance (world space) as six [C] columns.
    if cov3d_precomp is not None:
        Sigma = (
            cov3d_precomp[:, 0, 0], cov3d_precomp[:, 0, 1], cov3d_precomp[:, 0, 2],
            cov3d_precomp[:, 1, 1], cov3d_precomp[:, 1, 2], cov3d_precomp[:, 2, 2],
        )
    else:
        Sigma = _cov3d_cols(scales, rotations, scaling_modifier)

    view_rot = world_view_transform[:3, :3].T  # rows of W2C = world->cam rotation
    safe_depth = jnp.where(in_front, depths, 1.0)
    cov_xx, cov_xy, cov_yy = compute_cov2d_cols(
        view_x, view_y, safe_depth, Sigma, focal_x, focal_y, tan_fovx, tan_fovy, view_rot
    )

    det = cov_xx * cov_yy - cov_xy * cov_xy
    valid_det = det != 0.0
    det_inv = 1.0 / jnp.where(valid_det, det, 1.0)
    conic_a = cov_yy * det_inv
    conic_b = -cov_xy * det_inv
    conic_c = cov_xx * det_inv

    # Screen-space radius from the larger eigenvalue (3 sigma).
    mid = 0.5 * (cov_xx + cov_yy)
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

    # Per-AXIS binning extents (ellipse bounding box at the 1/255 level set):
    # for PSD conic Q = Sigma^{-1}, min over dy of d^T Q d at fixed dx is
    # dx^2 / Sigma_xx (conditional-variance identity), so |dx| >
    # sqrt(2 ln(255 opac) * Sigma_xx) forces alpha < 1/255 for EVERY dy —
    # same exactness argument as r_eff, axis by axis. The upstream CUDA
    # getRect uses the isotropic 3-sigma circle; for anisotropic splats the
    # per-axis box sheds the difference with zero image change.
    rb = radii_bin.astype(jnp.float32)
    rx_eff = jnp.minimum(rb, jnp.ceil(jnp.sqrt(2.0 * ln_term * jnp.maximum(cov_xx, 0.0))) + 1.0)
    ry_eff = jnp.minimum(rb, jnp.ceil(jnp.sqrt(2.0 * ln_term * jnp.maximum(cov_yy, 0.0))) + 1.0)
    rect_bin = jnp.where(visible[:, None], jnp.stack([rx_eff, ry_eff], axis=-1), 0.0).astype(jnp.int32)

    # Color: precomputed override or SH evaluated along the view direction
    # (degree-1 fast path expanded SoA; higher degrees fall back to eval_sh).
    if colors_precomp is not None:
        rgbs = colors_precomp
    else:
        assert shs is not None
        dx = px - camera_center[0]
        dy = py - camera_center[1]
        dz = pz - camera_center[2]
        inv_n = 1.0 / jnp.maximum(jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-12)
        dx, dy, dz = dx * inv_n, dy * inv_n, dz * inv_n
        if active_sh_degree == 0:
            raw = C0 * shs[:, 0, :] + 0.5
        elif active_sh_degree == 1:
            raw = (
                C0 * shs[:, 0, :]
                - (C1 * dy)[:, None] * shs[:, 1, :]
                + (C1 * dz)[:, None] * shs[:, 2, :]
                - (C1 * dx)[:, None] * shs[:, 3, :]
                + 0.5
            )
        else:
            from gaussian_transformer_tpu.utils.sh import eval_sh

            dirs = jnp.stack([dx, dy, dz], axis=-1)
            raw = eval_sh(active_sh_degree, jnp.swapaxes(shs, -1, -2), dirs) + 0.5
        rgbs = jnp.maximum(raw, 0.0)  # clamp-to-positive, matching the CUDA path

    opac = jnp.where(visible, opacities, 0.0)
    return Projected(
        means2d=jnp.stack([mean_x, mean_y], axis=-1),
        depths=depths,
        conics=jnp.stack([conic_a, conic_b, conic_c], axis=-1),
        radii=radii,
        rgbs=rgbs,
        opacities=opac,
        radii_bin=radii_bin,
        rect_bin=rect_bin,
    )
