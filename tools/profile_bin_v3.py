#!/usr/bin/env python
"""Stage-prefix timing of the v4 bin_stream pipeline (tiles.bin_stream) on the
real chip, matching the CURRENT code path. Prefix timings; deltas attribute
cost per stage.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_bin_v3.py [iters] [n_gaussians]
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
    from gaussian_transformer_tpu.render import RenderConfig, render, tune_config, _auto_chunk
    from gaussian_transformer_tpu.render.project import project_gaussians
    from gaussian_transformer_tpu.render.tiles import _expand_orig, num_tiles
    from gaussian_transformer_tpu.scene.cameras import Camera

    WIDTH, HEIGHT = 1920, 1080
    pcd, center, extent = bench._base_cloud()
    scene = bench._densified_scene(pcd, n_gauss) if n_gauss != 17618 else bench._table_scene(pcd)
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
    chunk = _auto_chunk(n_gauss, T, cfg)
    I_pad = ((cfg.max_stream + chunk - 1) // chunk) * chunk
    G = I_pad // chunk
    print(f"n={n_gauss} I={I} I_pad={I_pad} chunk={chunk}", flush=True)

    tan_fovx, tan_fovy = math.tan(cam.fovx * 0.5), math.tan(cam.fovy * 0.5)
    C = scene.capacity
    xyz0 = scene.get_xyz

    def pipeline(s, upto):
        acc = jnp.float32(0.0)
        proj = project_gaussians(
            xyz0 + s * 1e-38, scene.get_scaling, scene.get_rotation,
            scene.get_opacity[:, 0], scene.get_features, None,
            world_view_transform=cam.world_view_transform,
            full_proj_transform=cam.full_proj_transform,
            camera_center=cam.camera_center, image_width=WIDTH, image_height=HEIGHT,
            tan_fovx=tan_fovx, tan_fovy=tan_fovy, active_sh_degree=scene.active_sh_degree,
        )
        include = (proj.radii > 0) & (proj.opacities >= 1.0 / 255.0)
        means2d, depths, radii = proj.means2d, proj.depths, proj.radii_bin
        if upto == 0:  # projection only
            return acc + jnp.sum(means2d) * 1e-20 + jnp.sum(radii).astype(jnp.float32) * 1e-20

        tile_id, gauss_i, depth_i, cap_overflow, total_raw, offsets, cov = _expand_orig(
            means2d, depths, radii, include, grid_w, grid_h, R, I
        )
        if upto == 1:  # expansion: rects + owner scatter/cummax + flat gathers
            return acc + (jnp.sum(tile_id) + jnp.sum(gauss_i)).astype(jnp.float32) * 1e-20 + jnp.sum(depth_i) * 1e-30

        i_iota = jnp.arange(I, dtype=jnp.int32)
        sorted_tiles, _sd, sorted_gauss, sorted_u = jax.lax.sort(
            (tile_id, depth_i, gauss_i, i_iota), num_keys=2, is_stable=True
        )
        if upto == 2:  # two-key stable sort
            return acc + (jnp.sum(sorted_tiles) + jnp.sum(sorted_u)).astype(jnp.float32) * 1e-20

        valid = sorted_tiles < T
        boundary = jnp.concatenate([jnp.ones(1, bool), sorted_tiles[1:] != sorted_tiles[:-1]])
        run_start = jax.lax.cummax(jnp.where(boundary, i_iota, -1))
        is_last = jnp.concatenate([boundary[1:], jnp.ones(1, bool)])
        tail_pad = jnp.where(is_last & valid, jnp.mod(run_start - (i_iota + 1), chunk), 0)
        padsum = jnp.cumsum(tail_pad)
        n_padded = jnp.sum(valid.astype(jnp.int32)) + padsum[-1]
        padsum_excl = padsum - tail_pad
        in_budget = valid & (i_iota + padsum_excl < I_pad)
        pos = jnp.where(in_budget, i_iota + padsum_excl, I_pad + i_iota)
        if upto == 3:  # layout scans (run_start cummax + tail-pad cumsum)
            return acc + jnp.sum(pos).astype(jnp.float32) * 1e-20 + n_padded.astype(jnp.float32) * 1e-30

        stream_gauss = (
            jnp.full((I_pad,), C, jnp.int32).at[pos].set(sorted_gauss, mode="drop", unique_indices=True)
        )
        if upto == 4:  # stream_gauss flat scatter
            return acc + jnp.sum(stream_gauss).astype(jnp.float32) * 1e-20

        is_cs = in_budget & (pos % chunk == 0)
        cpos = jnp.where(is_cs, pos // chunk, G + i_iota)
        chunk_tile = jnp.full((G,), T, jnp.int32).at[cpos].set(sorted_tiles, mode="drop", unique_indices=True)
        pos_unsorted = (
            jnp.zeros((I,), jnp.int32).at[sorted_u].set(
                jnp.where(in_budget, pos, I_pad).astype(jnp.int32), unique_indices=True)
        )
        if upto == 5:  # chunk_tile + pos_unsorted scatters
            return acc + (jnp.sum(chunk_tile) + jnp.sum(pos_unsorted)).astype(jnp.float32) * 1e-20

        real_per_chunk = jnp.sum((stream_gauss < C).reshape(G, chunk), axis=1)
        counts = jnp.zeros((T + 1,), jnp.int32).at[chunk_tile].add(real_per_chunk, mode="drop")[:T]
        covered = jnp.zeros((T + 1,), bool).at[chunk_tile].set(True, mode="drop")[:T]
        return acc + (jnp.sum(counts) + jnp.sum(covered) + jnp.sum(pos_unsorted)).astype(jnp.float32) * 1e-20

    names = {
        0: "0 projection",
        1: "1 expand (owner+gathers)",
        2: "2 two-key sort",
        3: "3 layout scans",
        4: "4 stream_gauss scatter",
        5: "5 aux scatters",
        99: "6 diagnostics (full)",
    }

    def timeit(upto):
        fn = lambda s: pipeline(s, upto)
        run = jax.jit(lambda n: lax.fori_loop(0, n, lambda i, s: fn(s), jnp.float32(0.0)))
        t0 = time.time(); float(run(2)); tc = time.time() - t0
        t0 = time.time(); float(run(2)); t_base = time.time() - t0
        t0 = time.time(); float(run(2 + iters))
        dt = (time.time() - t0 - t_base) / iters
        print(f"upto {names[upto]:26s} {dt*1e3:8.2f} ms  (compile {tc:.0f}s)", flush=True)
        return dt

    order = (0, 1, 2, 3, 4, 5, 99)
    ts = [timeit(u) for u in order]
    print("\n--- deltas ---", flush=True)
    prev = 0.0
    for u, t in zip(order, ts):
        print(f"{names[u]:28s} {(t - prev) * 1e3:8.2f} ms")
        prev = t
    print(f"{'TOTAL':28s} {ts[-1]*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
