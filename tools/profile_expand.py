#!/usr/bin/env python
"""Micro-attribution of tiles._expand_orig internals on the real chip.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_expand.py [iters] [n_gaussians]
"""

import math
import sys
import time

import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_gauss = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    import jax
    import jax.lax as lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/gt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import bench
    from gaussian_transformer_tpu.render import RenderConfig, render, tune_config
    from gaussian_transformer_tpu.render.project import project_gaussians
    from gaussian_transformer_tpu.render.tiles import compute_rects, num_tiles
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
    cfg = RenderConfig()
    probe = render(cam, scene, cfg)
    cfg = tune_config(cfg, {k: int(np.asarray(probe[k])) for k in ("n_instances", "n_padded", "n_tiles") if k in probe})
    grid_w, grid_h = num_tiles(WIDTH), num_tiles(HEIGHT)
    T = grid_w * grid_h
    R = cfg.max_tiles_per_gaussian
    I = cfg.max_instances
    print(f"n={n_gauss} I={I}", flush=True)

    tan_fovx, tan_fovy = math.tan(cam.fovx * 0.5), math.tan(cam.fovy * 0.5)
    C = scene.capacity
    xyz0 = scene.get_xyz

    proj0 = project_gaussians(
        xyz0, scene.get_scaling, scene.get_rotation,
        scene.get_opacity[:, 0], scene.get_features, None,
        world_view_transform=cam.world_view_transform,
        full_proj_transform=cam.full_proj_transform,
        camera_center=cam.camera_center, image_width=WIDTH, image_height=HEIGHT,
        tan_fovx=tan_fovx, tan_fovy=tan_fovy, active_sh_degree=scene.active_sh_degree,
    )
    proj0 = jax.device_put(proj0)
    include0 = (proj0.radii > 0) & (proj0.opacities >= 1.0 / 255.0)

    def stage(s, upto):
        means2d = proj0.means2d + s * 1e-38
        depths, radii, include = proj0.depths, proj0.radii_bin, include0
        acc = jnp.float32(0.0)
        min_x, min_y, max_x, max_y = compute_rects(means2d, radii, grid_w, grid_h)
        w = max_x - min_x
        cov_raw = jnp.where(include, w * (max_y - min_y), 0)
        cov = jnp.minimum(cov_raw, R)
        offsets = jnp.concatenate([jnp.zeros(1, cov.dtype), jnp.cumsum(cov)[:-1]])
        total = offsets[-1] + cov[-1]
        if upto == 0:  # [C]-domain rects + cumsum
            return acc + (jnp.sum(offsets) + total).astype(jnp.float32) * 1e-20
        j = jnp.arange(I, dtype=jnp.int32)
        seed = jnp.full((I,), -1, jnp.int32)
        marks = seed.at[offsets].max(jnp.arange(C, dtype=jnp.int32), mode="drop")
        if upto == 1:  # + scatter-max
            return acc + jnp.sum(marks).astype(jnp.float32) * 1e-20
        gauss_raw = jax.lax.cummax(marks)
        if upto == 2:  # + cummax
            return acc + jnp.sum(gauss_raw).astype(jnp.float32) * 1e-20
        inst_valid = (j < total) & (gauss_raw >= 0)
        gi_safe = jnp.clip(gauss_raw, 0, C - 1)
        f32 = jnp.float32
        w_safe = jnp.maximum(w, 1)
        rect_xy = (min_x + min_y * 1024).astype(f32)
        packed = jnp.stack(
            [rect_xy, w_safe.astype(f32), offsets.astype(f32), depths.astype(f32)], axis=1
        )
        vals = packed[gi_safe]  # [I, 4] row gather
        rxy, w_g, off_g, dep_g = vals[:, 0], vals[:, 1], vals[:, 2], vals[:, 3]
        if upto == 3:  # + packed row gather
            return acc + (jnp.sum(rxy) + jnp.sum(off_g)).astype(jnp.float32) * 1e-20 + jnp.sum(dep_g) * 1e-30
        r_i = j.astype(f32) - off_g
        q = jnp.floor((r_i + 0.5) / w_g)
        rem = r_i - q * w_g
        min_y_g = jnp.floor((rxy + 0.5) * (1.0 / 1024.0))
        tx = (rxy - 1024.0 * min_y_g) + rem
        ty = min_y_g + q
        tile_id = jnp.where(inst_valid, (ty * grid_w + tx).astype(jnp.int32), T).astype(jnp.int32)
        gauss_i = jnp.where(inst_valid, gi_safe, C).astype(jnp.int32)
        depth_i = jnp.where(inst_valid, dep_g, jnp.inf)
        return acc + (jnp.sum(tile_id) + jnp.sum(gauss_i)).astype(jnp.float32) * 1e-20 + jnp.sum(depth_i) * 1e-30

    names = {0: "0 [C] rects+cumsum", 1: "1 +scatter-max", 2: "2 +cummax",
             3: "3 +packed row gather", 4: "4 +tile math (full)"}

    def timeit(upto):
        fn = lambda s: stage(s, upto)
        run = jax.jit(lambda n: lax.fori_loop(0, n, lambda i, s: fn(s), jnp.float32(0.0)))
        t0 = time.time(); float(run(2)); tc = time.time() - t0
        t0 = time.time(); float(run(2)); t_base = time.time() - t0
        t0 = time.time(); float(run(2 + iters))
        dt = (time.time() - t0 - t_base) / iters
        print(f"{names[upto]:24s} {dt*1e3:8.2f} ms  (compile {tc:.0f}s)", flush=True)
        return dt

    order = (0, 1, 2, 3, 4)
    ts = [timeit(u) for u in order]
    print("\n--- deltas ---")
    prev = 0.0
    for u, t in zip(order, ts):
        print(f"{names[u]:24s} {(t - prev) * 1e3:8.2f} ms")
        prev = t


if __name__ == "__main__":
    main()
