#!/usr/bin/env python
"""Prefix timing of project_gaussians internals on the real chip — finds which
sub-stage pays for the [C,3,3]/[C,2,3] tiny-matmul layouts at scale.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_proj.py [iters] [n_gaussians]
"""

import math
import sys
import time

import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_gauss = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    import jax
    import jax.lax as lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/gt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import bench
    from gaussian_transformer_tpu.render.project import compute_cov2d, ndc_to_pixel
    from gaussian_transformer_tpu.utils.graphics import build_covariance_3d
    from gaussian_transformer_tpu.utils.sh import eval_sh
    from gaussian_transformer_tpu.scene.cameras import Camera

    WIDTH, HEIGHT = 1920, 1080
    pcd, center, extent = bench._base_cloud()
    scene = bench._densified_scene(pcd, n_gauss)
    rng = np.random.RandomState(0)
    cam = Camera.create(
        colmap_id=0, R=np.eye(3), T=np.asarray(-center + np.array([0, 0, extent * 2.0])),
        fovx=math.radians(70), fovy=math.radians(70 * HEIGHT / WIDTH),
        image=rng.rand(3, HEIGHT, WIDTH).astype(np.float32), gt_alpha_mask=None,
        image_name="bench", uid=0,
    )
    tan_fovx, tan_fovy = math.tan(cam.fovx * 0.5), math.tan(cam.fovy * 0.5)
    focal_x = WIDTH / (2.0 * tan_fovx)
    focal_y = HEIGHT / (2.0 * tan_fovy)

    C = scene.capacity
    xyz0 = scene.get_xyz

    def pipeline(s, upto):
        xyz = xyz0 + s * 1e-38
        acc = jnp.float32(0.0)
        # activations
        scales = scene.get_scaling
        rotations = scene.get_rotation
        opacities = scene.get_opacity[:, 0]
        shs = scene.get_features
        if upto == 0:  # activations only
            return acc + (jnp.sum(scales) + jnp.sum(rotations) + jnp.sum(opacities)) * 1e-20

        ones = jnp.ones((C, 1), dtype=xyz.dtype)
        xyz_h = jnp.concatenate([xyz, ones], axis=1)
        p_view = xyz_h @ cam.world_view_transform
        p_hom = xyz_h @ cam.full_proj_transform
        p_w = 1.0 / (p_hom[:, 3] + 1e-7)
        p_proj = p_hom[:, :3] * p_w[:, None]
        depths = p_view[:, 2]
        in_front = depths > 0.2
        mean_x = ndc_to_pixel(p_proj[:, 0], WIDTH)
        mean_y = ndc_to_pixel(p_proj[:, 1], HEIGHT)
        if upto == 1:  # homogeneous transforms
            return acc + (jnp.sum(mean_x) + jnp.sum(mean_y) + jnp.sum(depths)) * 1e-20

        cov3d = build_covariance_3d(scales, rotations, 1.0)
        if upto == 2:  # 3D covariance (quat -> L L^T, [C,3,3] matmuls)
            return acc + jnp.sum(cov3d) * 1e-20

        view_rot = cam.world_view_transform[:3, :3].T
        safe_depth = jnp.where(in_front, depths, 1.0)
        p_view_safe = jnp.concatenate([p_view[:, :2], safe_depth[:, None]], axis=1)
        cov2d = compute_cov2d(p_view_safe, cov3d, focal_x, focal_y, tan_fovx, tan_fovy, view_rot)
        det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
        det_safe = jnp.where(det != 0.0, det, 1.0)
        det_inv = 1.0 / det_safe
        conics = jnp.stack([cov2d[:, 2] * det_inv, -cov2d[:, 1] * det_inv, cov2d[:, 0] * det_inv], axis=-1)
        mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
        lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
        radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))
        if upto == 3:  # EWA cov2d + conic + radius
            return acc + (jnp.sum(conics) + jnp.sum(radius_f)) * 1e-20

        dirs = xyz - cam.camera_center[None, :]
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        raw = eval_sh(1, jnp.swapaxes(shs, -1, -2), dirs) + 0.5
        rgbs = jnp.maximum(raw, 0.0)
        return acc + (jnp.sum(conics) + jnp.sum(radius_f) + jnp.sum(rgbs)) * 1e-20

    names = {0: "0 activations", 1: "1 homog transforms", 2: "2 cov3d", 3: "3 cov2d+conic", 4: "4 SH eval (full)"}

    def timeit(upto):
        fn = lambda s: pipeline(s, upto)
        run = jax.jit(lambda n: lax.fori_loop(0, n, lambda i, s: fn(s), jnp.float32(0.0)))
        t0 = time.time(); float(run(2)); tc = time.time() - t0
        t0 = time.time(); float(run(2)); t_base = time.time() - t0
        t0 = time.time(); float(run(2 + iters))
        dt = (time.time() - t0 - t_base) / iters
        print(f"upto {names[upto]:22s} {dt*1e3:8.2f} ms  (compile {tc:.0f}s)", flush=True)
        return dt

    ts = [timeit(u) for u in (0, 1, 2, 3, 4)]
    print("\n--- deltas ---", flush=True)
    prev = 0.0
    for u, t in zip((0, 1, 2, 3, 4), ts):
        print(f"{names[u]:24s} {(t - prev) * 1e3:8.2f} ms")
        prev = t


if __name__ == "__main__":
    main()
