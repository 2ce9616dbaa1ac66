#!/usr/bin/env python
"""Stage-prefix timing of the v3 bin_stream pipeline (tiles.bin_stream) on the
real chip, matching the CURRENT code path (profile_binning.py profiles the
retired v2 layout). Prefix timings; deltas attribute cost per stage.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_bin_v3.py [iters] [n_gaussians]
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
    from gaussian_transformer_tpu.render.tiles import compute_rects, num_tiles
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

        # --- _expand_unsorted ---
        sort_key = jnp.where(include, depths, jnp.inf)
        order = jnp.argsort(sort_key).astype(jnp.int32)
        means2d_s = means2d[order]
        radii_s = radii[order]
        include_s = include[order]
        if upto == 1:
            return acc + jnp.sum(means2d_s) * 1e-20 + jnp.sum(radii_s).astype(jnp.float32) * 1e-20

        min_x, min_y, max_x, max_y = compute_rects(means2d_s, radii_s, grid_w, grid_h)
        w = max_x - min_x
        cov_raw = jnp.where(include_s, w * (max_y - min_y), 0)
        cov = jnp.minimum(cov_raw, R)
        offsets = jnp.concatenate([jnp.zeros(1, cov.dtype), jnp.cumsum(cov)[:-1]])
        total = offsets[-1] + cov[-1]
        j = jnp.arange(I, dtype=jnp.int32)
        seed = jnp.full((I,), -1, jnp.int32)
        marks = seed.at[offsets].max(jnp.arange(C, dtype=jnp.int32), mode="drop")
        gauss_i = jax.lax.cummax(marks)
        inst_valid = (j < total) & (gauss_i >= 0)
        gi_safe = jnp.clip(gauss_i, 0, C - 1)
        gauss_i = jnp.where(inst_valid, gi_safe, C).astype(jnp.int32)
        if upto == 2:  # owner map (scatter-max + cummax over [I])
            return acc + jnp.sum(gauss_i).astype(jnp.float32) * 1e-20

        w_safe = jnp.maximum(w, 1)
        packed = jnp.stack([min_x, min_y, w_safe, offsets], axis=1)
        vals = packed[gi_safe]
        r_i = j - vals[:, 3]
        tx = vals[:, 0] + r_i % vals[:, 2]
        ty = vals[:, 1] + r_i // vals[:, 2]
        tile_id = jnp.where(inst_valid, ty * grid_w + tx, T).astype(jnp.int32)
        if upto == 3:  # packed row gather + tile ids
            return acc + jnp.sum(tile_id).astype(jnp.float32) * 1e-20

        # --- bin_stream body ---
        i_iota = jnp.arange(I, dtype=jnp.int32)
        sorted_tiles, sorted_gauss, sorted_u = jax.lax.sort(
            (tile_id, gauss_i, i_iota), num_keys=1, is_stable=True
        )
        if upto == 4:  # stable 3-payload tile sort over [I]
            return acc + jnp.sum(sorted_tiles).astype(jnp.float32) * 1e-20

        valid = sorted_tiles < T
        boundary = jnp.concatenate([jnp.ones(1, bool), sorted_tiles[1:] != sorted_tiles[:-1]])
        run_start = jax.lax.cummax(jnp.where(boundary, i_iota, -1))
        rank = i_iota - run_start
        next_b = jax.lax.cummin(jnp.where(boundary, i_iota, I)[::-1])[::-1]
        next_b = jnp.concatenate([next_b[1:], jnp.full(1, I, jnp.int32)])
        run_len = next_b - run_start
        padded_len = jnp.where(valid, ((run_len + chunk - 1) // chunk) * chunk, 0)
        incr = jnp.where(boundary, padded_len, 0)
        pstart_excl = jnp.cumsum(incr) - incr
        seg_pstart = jax.lax.cummax(jnp.where(boundary, pstart_excl, -1))
        n_padded = jnp.sum(incr)
        if upto == 5:  # boundary/rank/padded-start scans over [I]
            return acc + (jnp.sum(seg_pstart) + jnp.sum(rank)).astype(jnp.float32) * 1e-20

        in_budget = valid & (seg_pstart + rank < I_pad)
        pos = jnp.where(in_budget, seg_pstart + rank, I_pad + i_iota)
        packed2 = jnp.stack([sorted_gauss, sorted_tiles], axis=1)
        stream = (
            jnp.concatenate(
                [jnp.full((I_pad, 1), C, jnp.int32), jnp.full((I_pad, 1), T, jnp.int32)],
                axis=1,
            )
            .at[pos]
            .set(packed2, mode="drop", unique_indices=True)
        )
        stream_gauss = stream[:, 0]
        chunk_tile = stream[::chunk, 1]
        if upto == 6:  # stream scatter [I]->[I_pad]
            return acc + (jnp.sum(stream_gauss) + jnp.sum(chunk_tile)).astype(jnp.float32) * 1e-20

        pos_unsorted = (
            jnp.zeros((I,), jnp.int32)
            .at[sorted_u]
            .set(jnp.where(in_budget, pos, I_pad).astype(jnp.int32), unique_indices=True)
        )
        if upto == 7:  # pullback permutation scatter [I]
            return acc + jnp.sum(pos_unsorted).astype(jnp.float32) * 1e-20

        real_per_chunk = jnp.sum((stream_gauss < C).reshape(G, chunk), axis=1)
        counts = jnp.zeros((T + 1,), jnp.int32).at[chunk_tile].add(real_per_chunk, mode="drop")[:T]
        covered = jnp.zeros((T + 1,), bool).at[chunk_tile].set(True, mode="drop")[:T]
        return acc + (jnp.sum(counts) + jnp.sum(covered) + jnp.sum(pos_unsorted)).astype(jnp.float32) * 1e-20 + n_padded.astype(jnp.float32) * 1e-30

    names = {
        0: "0 projection",
        1: "1 depth argsort+gathers",
        2: "2 owner scatter+cummax",
        3: "3 tile-id row gather",
        4: "4 stable tile sort",
        5: "5 rank/pstart scans",
        6: "6 stream scatter",
        7: "7 pos_unsorted scatter",
        99: "8 diagnostics (full)",
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

    ts = [timeit(u) for u in (0, 1, 2, 3, 4, 5, 6, 7, 99)]
    print("\n--- deltas ---", flush=True)
    prev = 0.0
    for u, t in zip((0, 1, 2, 3, 4, 5, 6, 7, 99), ts):
        print(f"{names[u]:28s} {(t - prev) * 1e3:8.2f} ms")
        prev = t
    print(f"{'TOTAL':28s} {ts[-1]*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
