#!/usr/bin/env python
"""Chained-loop timing of the binning pipeline's internal stages on the real
chip (prefix timings; deltas attribute cost to each stage).

Usage: PYTHONPATH=/root/repo python tools/profile_binning.py [iters] [n_gaussians]
"""

import math
import sys
import time

import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    import jax
    import jax.lax as lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/gt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from gaussian_transformer_tpu.render import RenderConfig, render, tune_config
    from gaussian_transformer_tpu.render.project import project_gaussians
    from gaussian_transformer_tpu.render.tiles import CHUNK, compute_rects, num_tiles
    from gaussian_transformer_tpu.scene.cameras import Camera
    from gaussian_transformer_tpu.scene.gaussians import GaussianScene
    from gaussian_transformer_tpu.scene.ply import fetch_point_cloud

    WIDTH, HEIGHT = 1920, 1080
    pcd = fetch_point_cloud("/root/reference/table_ds/sparse/0/points3D.ply")
    n_gauss = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    if n_gauss:
        import bench  # repo-root bench.py: densified-scene synthesis
        scene = bench._densified_scene(pcd, n_gauss)
        print(f"densified scene: {n_gauss} gaussians", flush=True)
    else:
        scene = GaussianScene.from_pcd(pcd, max_sh_degree=1)
    center = pcd.points.mean(0)
    extent = float(np.abs(pcd.points - center).max())
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
    I = cfg.max_instances
    print(f"budget I={I}", flush=True)

    tan_fovx, tan_fovy = math.tan(cam.fovx * 0.5), math.tan(cam.fovy * 0.5)
    grid_w, grid_h = num_tiles(WIDTH), num_tiles(HEIGHT)
    T = grid_w * grid_h
    R = cfg.max_tiles_per_gaussian

    proj = project_gaussians(
        scene.get_xyz, scene.get_scaling, scene.get_rotation,
        scene.get_opacity[:, 0], scene.get_features, None,
        world_view_transform=cam.world_view_transform,
        full_proj_transform=cam.full_proj_transform,
        camera_center=cam.camera_center, image_width=WIDTH, image_height=HEIGHT,
        tan_fovx=tan_fovx, tan_fovy=tan_fovy, active_sh_degree=scene.active_sh_degree,
    )
    proj = jax.device_put(proj)
    include0 = (proj.radii > 0) & (proj.opacities >= 1.0 / 255.0)
    C = proj.means2d.shape[0]

    def pipeline(s, upto):
        means2d = proj.means2d + s * 1e-38
        depths, radii, include = proj.depths, proj.radii, include0
        acc = jnp.float32(0.0)

        # 1. depth argsort + gathers
        sort_key = jnp.where(include, depths, jnp.inf)
        order = jnp.argsort(sort_key).astype(jnp.int32)
        means2d_s = means2d[order]
        radii_s = radii[order]
        include_s = include[order]
        if upto == 1:
            return acc + jnp.sum(means2d_s) * 1e-20 + jnp.sum(radii_s).astype(jnp.float32) * 1e-20

        # 2-4. rects, layout, cummax owner map
        min_x, min_y, max_x, max_y = compute_rects(means2d_s, radii_s, grid_w, grid_h)
        w = max_x - min_x
        cov_raw = jnp.where(include_s, w * (max_y - min_y), 0)
        cov = jnp.minimum(cov_raw, R)
        offsets = jnp.concatenate([jnp.zeros(1, cov.dtype), jnp.cumsum(cov)[:-1]])
        total = offsets[-1] + cov[-1]
        j = jnp.arange(I, dtype=jnp.int32)
        marks = jnp.full((I,), -1, jnp.int32).at[offsets].max(
            jnp.arange(C, dtype=jnp.int32), mode="drop")
        gauss_i = lax.cummax(marks)
        inst_valid = (j < total) & (gauss_i >= 0)
        gi_safe = jnp.clip(gauss_i, 0, C - 1)
        gauss_i = jnp.where(inst_valid, gi_safe, C).astype(jnp.int32)
        if upto == 4:
            return acc + jnp.sum(gauss_i).astype(jnp.float32) * 1e-20

        # 5. packed gather + tile ids
        w_safe = jnp.maximum(w, 1)
        packed = jnp.stack([min_x, min_y, w_safe, offsets], axis=1)
        vals = packed[gi_safe]
        r_i = j - vals[:, 3]
        tx = vals[:, 0] + r_i % vals[:, 2]
        ty = vals[:, 1] + r_i // vals[:, 2]
        tile_id = jnp.where(inst_valid, ty * grid_w + tx, T).astype(jnp.int32)
        if upto == 5:
            return acc + jnp.sum(tile_id).astype(jnp.float32) * 1e-20

        # 6. stable sort by tile
        sorted_tiles, sorted_gauss = lax.sort_key_val(tile_id, gauss_i, is_stable=True)
        if upto == 6:
            return acc + jnp.sum(sorted_tiles).astype(jnp.float32) * 1e-20

        # 7-9. histogram, cumsums, rank
        counts = jnp.zeros((T + 1,), jnp.int32).at[tile_id].add(1, mode="drop")[:T]
        starts_ext = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)])
        inst_rank = jnp.arange(I, dtype=jnp.int32) - starts_ext[jnp.minimum(sorted_tiles, T)]
        if upto == 9:
            return acc + jnp.sum(inst_rank).astype(jnp.float32) * 1e-20

        # 10-11. padded positions + scatters + chunk map
        padded_counts = ((counts + CHUNK - 1) // CHUNK) * CHUNK
        pstart = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(padded_counts)])
        valid = sorted_tiles < T
        pos = jnp.where(valid, pstart[jnp.minimum(sorted_tiles, T)] + inst_rank, I)
        stream_gauss = jnp.full((I,), C, jnp.int32).at[pos].set(sorted_gauss, mode="drop")
        stream_tile = jnp.full((I,), T, jnp.int32).at[pos].set(sorted_tiles, mode="drop")
        chunk_tile = stream_tile[::CHUNK]
        return (
            acc + jnp.sum(stream_gauss).astype(jnp.float32) * 1e-20
            + jnp.sum(chunk_tile).astype(jnp.float32) * 1e-20
        )

    def timeit(name, upto):
        fn = lambda s: pipeline(s, upto)
        run = jax.jit(lambda n: lax.fori_loop(0, n, lambda i, s: fn(s), jnp.float32(0.0)))
        t0 = time.time(); float(run(2)); tc = time.time() - t0
        t0 = time.time(); float(run(2)); t_base = time.time() - t0
        t0 = time.time(); float(run(2 + iters))
        dt = (time.time() - t0 - t_base) / iters
        print(f"upto {name:22s} {dt*1e3:8.2f} ms  (compile {tc:.0f}s)", flush=True)
        return dt

    t1 = timeit("1 depth argsort", 1)
    t4 = timeit("4 expand+cummax", 4)
    t5 = timeit("5 tile ids", 5)
    t6 = timeit("6 tile sort", 6)
    t9 = timeit("9 hist+rank", 9)
    tf = timeit("11 full (scatters)", 99)
    print("\n--- deltas ---")
    print(f"depth argsort      {t1*1e3:8.2f} ms")
    print(f"expand+cummax      {(t4-t1)*1e3:8.2f} ms")
    print(f"tile ids gather    {(t5-t4)*1e3:8.2f} ms")
    print(f"tile sort          {(t6-t5)*1e3:8.2f} ms")
    print(f"hist+rank          {(t9-t6)*1e3:8.2f} ms")
    print(f"padded scatters    {(tf-t9)*1e3:8.2f} ms")
    print(f"TOTAL              {tf*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
