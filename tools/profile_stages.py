#!/usr/bin/env python
"""Accurate per-stage timing of the render/train pipeline on the real chip.

The axon tunnel adds large per-dispatch latency, so each stage is timed as N
sequentially-chained on-device iterations inside ONE ``lax.fori_loop`` dispatch
(carry scalar folded into an input so XLA cannot elide iterations), with the
trip count TRACED (a static count would recompile inside the timed region).
The dispatch+fetch base latency is measured at n=2 and subtracted.

Caveat: isolated stages can compile differently than inside the full graph;
use the full-graph rows as ground truth and the deltas as hints.

Usage: PYTHONPATH=/root/repo python tools/profile_stages.py [iters]
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
    from gaussian_transformer_tpu.render.tiles import bin_stream, num_tiles
    from gaussian_transformer_tpu.scene.cameras import Camera
    from gaussian_transformer_tpu.scene.gaussians import GaussianScene
    from gaussian_transformer_tpu.scene.densify import DensifyStats
    from gaussian_transformer_tpu.scene.ply import fetch_point_cloud
    from gaussian_transformer_tpu.train.optim import AdamState
    from gaussian_transformer_tpu.train.splat import OptConfig, train_step
    from gaussian_transformer_tpu.ops.losses import ssim

    WIDTH, HEIGHT = 1920, 1080
    pcd = fetch_point_cloud("/root/reference/table_ds/sparse/0/points3D.ply")
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
    n_inst = int(np.asarray(probe["n_instances"]))
    cfg = tune_config(cfg, {k: int(np.asarray(probe[k])) for k in ("n_instances", "n_padded", "n_tiles") if k in probe})
    print(f"n_inst={n_inst} budgets I={cfg.max_instances} stream={cfg.max_stream}", flush=True)

    tan_fovx = math.tan(cam.fovx * 0.5)
    tan_fovy = math.tan(cam.fovy * 0.5)
    grid_w, grid_h = num_tiles(WIDTH), num_tiles(HEIGHT)
    gt = jnp.asarray(cam.original_image)
    bg = jnp.zeros(3, jnp.float32)
    opt = OptConfig()
    adam0 = AdamState.init(scene)
    stats0 = DensifyStats.init(scene.capacity)
    slrs = jnp.asarray(extent, jnp.float32)

    def proj_of(s):
        return project_gaussians(
            scene.get_xyz + s * 1e-38, scene.get_scaling, scene.get_rotation,
            scene.get_opacity[:, 0], scene.get_features, None,
            world_view_transform=cam.world_view_transform,
            full_proj_transform=cam.full_proj_transform,
            camera_center=cam.camera_center,
            image_width=WIDTH, image_height=HEIGHT,
            tan_fovx=tan_fovx, tan_fovy=tan_fovy,
            active_sh_degree=scene.active_sh_degree,
        )

    def stage_project(s):
        p = proj_of(s)
        return jnp.sum(p.means2d) * 1e-20 + jnp.sum(p.rgbs) * 1e-20

    def stage_bin(s):
        p = proj_of(s)
        b = bin_stream(
            p.means2d, p.depths, p.radii,
            (p.radii > 0) & (p.opacities >= 1.0 / 255.0),
            grid_w=grid_w, grid_h=grid_h, max_instances=cfg.max_instances,
        )
        return (jnp.sum(b.tile_counts) + jnp.sum(b.stream_gauss)).astype(jnp.float32) * 1e-20

    def stage_render_fwd(s):
        out = render(cam, scene.replace(xyz=scene.xyz + s * 1e-38), cfg, bg)
        return jnp.sum(out["render"]) * 1e-20

    def mk_bwd(with_ssim):
        def loss_of(p, offs):
            out = render(cam, scene.replace(xyz=p), cfg, bg, screenspace_offset=offs)
            img = out["render"]
            l = jnp.abs(img - gt).mean()
            if with_ssim:
                l = 0.8 * l + 0.2 * (1.0 - ssim(img, gt))
            return l

        def stage(s):
            offs = jnp.zeros((scene.capacity, 2), jnp.float32)
            val, grads = jax.value_and_grad(loss_of, argnums=(0, 1))(
                scene.xyz + s * 1e-38, offs
            )
            return val * 1e-20 + jnp.sum(grads[0]) * 1e-25 + jnp.sum(grads[1]) * 1e-25
        return stage

    def stage_loss_only(s):
        img = gt * (1.0 + s * 1e-38)
        def f(x):
            return 0.8 * jnp.abs(x - gt).mean() + 0.2 * (1.0 - ssim(x, gt))
        val, g = jax.value_and_grad(f)(img)
        return val * 1e-20 + jnp.sum(g) * 1e-25

    # Isolated instance-gradient pullback: scatter-add of [I_pad, 16] rows into
    # [C+1, 16] (the backward of the props gather).
    I_pad = cfg.max_instances
    C1 = scene.capacity + 1
    key = jax.random.PRNGKey(0)
    fake_g = jax.random.normal(key, (I_pad, 16), jnp.float32)
    fake_idx = jax.random.randint(key, (I_pad,), 0, C1)

    def stage_scatter(s):
        g = fake_g + s * 1e-38
        out = jnp.zeros((C1, 16), jnp.float32).at[fake_idx].add(g)
        return jnp.sum(out) * 1e-25

    def stage_train_step(s):
        sc = scene.replace(xyz=scene.xyz + s * 1e-38)
        sc2, adam, stats, m = train_step(
            sc, adam0, stats0, cam, bg, jnp.float32(1.0), slrs, opt, cfg
        )
        return m["loss"] * 1e-20 + jnp.sum(sc2.xyz) * 1e-30

    def timeit(name, fn):
        run = jax.jit(lambda n: lax.fori_loop(0, n, lambda i, s: fn(s), jnp.float32(0.0)))
        t0 = time.time(); float(run(2)); tc = time.time() - t0
        t0 = time.time(); float(run(2)); t_base = time.time() - t0
        t0 = time.time(); float(run(2 + iters))
        dt = (time.time() - t0 - t_base) / iters
        print(f"{name:26s} {dt*1e3:8.2f} ms/iter   (compile {tc:.0f}s, base {t_base*1e3:.0f}ms)", flush=True)
        return dt

    t_proj = timeit("project", stage_project)
    t_bin = timeit("project+bin", stage_bin)
    t_fwd = timeit("render fwd", stage_render_fwd)
    t_bwd_l1 = timeit("fwd+bwd L1 only", mk_bwd(False))
    t_bwd = timeit("fwd+bwd L1+SSIM", mk_bwd(True))
    t_loss = timeit("L1+SSIM loss fwd+bwd", stage_loss_only)
    t_scat = timeit("scatter-add I->C", stage_scatter)
    t_step = timeit("full train_step", stage_train_step)

    print("\n--- deltas (hints) ---")
    print(f"project              {t_proj*1e3:8.2f} ms")
    print(f"binning              {(t_bin-t_proj)*1e3:8.2f} ms")
    print(f"composite fwd+gather {(t_fwd-t_bin)*1e3:8.2f} ms")
    print(f"render bwd (L1)      {(t_bwd_l1-t_fwd)*1e3:8.2f} ms")
    print(f"ssim fwd+bwd (delta) {(t_bwd-t_bwd_l1)*1e3:8.2f} ms")
    print(f"ssim loss standalone {t_loss*1e3:8.2f} ms")
    print(f"scatter-add isolate  {t_scat*1e3:8.2f} ms")
    print(f"adam etc (step-bwd)  {(t_step-t_bwd)*1e3:8.2f} ms")
    print(f"TOTAL train_step     {t_step*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
