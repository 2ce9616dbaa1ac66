#!/usr/bin/env python
"""Coarse attribution of the large-scene train step on the real chip:
bin_stream only / render forward / render fwd+bwd, each timed as chained
on-device iterations (one dispatch), at a bench-style densified scene size.

Usage: PYTHONPATH=/root/repo python tools/profile_1m_step.py [n_gauss] [iters]
"""

import math
import sys
import time

import numpy as np


def main():
    n_gauss = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    import jax
    import jax.lax as lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/gt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import bench
    from gaussian_transformer_tpu.render import RenderConfig, render, tune_config, _auto_chunk
    from gaussian_transformer_tpu.render.project import project_gaussians
    from gaussian_transformer_tpu.render.tiles import bin_stream, num_tiles
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
    print(f"n={n_gauss} I={cfg.max_instances} stream={cfg.max_stream} "
          f"chunk={_auto_chunk(n_gauss, num_tiles(WIDTH) * num_tiles(HEIGHT), cfg)}",
          flush=True)

    tan_fovx, tan_fovy = math.tan(cam.fovx * 0.5), math.tan(cam.fovy * 0.5)
    grid_w, grid_h = num_tiles(WIDTH), num_tiles(HEIGHT)
    xyz = scene.get_xyz

    def fwd(s):
        out = render(cam, scene.replace(xyz=xyz + s * 1e-38), cfg)
        return jnp.sum(out["render"]) * 1e-20

    def fwdbwd(s):
        g = jax.grad(lambda x: jnp.sum(render(cam, scene.replace(xyz=x), cfg)["render"]))(
            xyz + s * 1e-38
        )
        return jnp.sum(g) * 1e-20

    def binonly(s):
        proj = project_gaussians(
            xyz + s * 1e-38, scene.get_scaling, scene.get_rotation,
            scene.get_opacity[:, 0], scene.get_features, None,
            world_view_transform=cam.world_view_transform,
            full_proj_transform=cam.full_proj_transform,
            camera_center=cam.camera_center, image_width=WIDTH, image_height=HEIGHT,
            tan_fovx=tan_fovx, tan_fovy=tan_fovy, active_sh_degree=scene.active_sh_degree,
        )
        include = (proj.radii > 0) & (proj.opacities >= 1.0 / 255.0)
        b = bin_stream(
            proj.means2d, proj.depths, proj.radii_bin, include,
            grid_w=grid_w, grid_h=grid_h,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            max_instances=cfg.max_instances, max_stream=cfg.max_stream,
            chunk=_auto_chunk(n_gauss, grid_w * grid_h, cfg),
        )
        return (jnp.sum(b.stream_gauss) + jnp.sum(b.chunk_tile)).astype(jnp.float32) * 1e-20

    def timeit(name, fn):
        run = jax.jit(lambda n: lax.fori_loop(0, n, lambda i, s: fn(s), jnp.float32(0.0)))
        t0 = time.time(); float(run(2)); tc = time.time() - t0
        t0 = time.time(); float(run(2)); t_base = time.time() - t0
        t0 = time.time(); float(run(2 + iters))
        dt = (time.time() - t0 - t_base) / iters
        print(f"{name:28s} {dt*1e3:9.2f} ms  (compile {tc:.0f}s)", flush=True)

    timeit("project+bin_stream", binonly)
    timeit("render forward", fwd)
    timeit("render fwd+bwd(xyz)", fwdbwd)


if __name__ == "__main__":
    main()
