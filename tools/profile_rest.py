#!/usr/bin/env python
"""Attribute the train_step's non-render cost ("rest") on the real chip:
times (a) render fwd+bwd only, (b) + loss (L1 + SSIM), (c) the full
train_step (loss + Adam + densify stats + bookkeeping), as chained on-device
loops at a bench-style scene size.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_rest.py [n_gauss] [iters]
"""

import math
import sys
import time

import numpy as np


def main():
    n_gauss = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import jax
    import jax.lax as lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/gt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import bench
    from gaussian_transformer_tpu.render import RenderConfig, render, tune_config
    from gaussian_transformer_tpu.ops.losses import l1_loss, ssim
    from gaussian_transformer_tpu.scene.cameras import Camera
    from gaussian_transformer_tpu.scene.densify import DensifyStats
    from gaussian_transformer_tpu.train.optim import AdamState
    from gaussian_transformer_tpu.train.splat import OptConfig, train_step

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
    print(f"n={n_gauss} I={cfg.max_instances} stream={cfg.max_stream}", flush=True)

    opt = OptConfig()
    bg = jnp.zeros(3, jnp.float32)
    gt = cam.original_image
    xyz0 = scene.get_xyz

    def fwdbwd(s):
        g = jax.grad(lambda x: jnp.sum(render(cam, scene.replace(xyz=x), cfg)["render"]))(
            xyz0 + s * 1e-38
        )
        return jnp.sum(g) * 1e-20

    def withloss(s):
        def loss_fn(x):
            img = render(cam, scene.replace(xyz=x), cfg, bg_color=bg)["render"]
            l1 = l1_loss(img, gt)
            return (1.0 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (1.0 - ssim(img, gt))

        g = jax.grad(loss_fn)(xyz0 + s * 1e-38)
        return jnp.sum(g) * 1e-20

    adam0 = AdamState.init(scene)
    stats0 = DensifyStats.init(scene.capacity)
    slrs = jnp.asarray(extent, jnp.float32)

    def fullstep_loop(n):
        def body(i, carry):
            sc, ad, st = carry
            sc, ad, st, m = train_step(sc, ad, st, cam, bg, i.astype(jnp.float32) + 1.0, slrs, opt, cfg)
            return sc, ad, st

        return lax.fori_loop(0, n, body, (scene, adam0, stats0))

    def timeit(name, fn, full=False):
        if full:
            run = jax.jit(fullstep_loop)
            sync = lambda out: np.asarray(out[0].xyz[:1])
        else:
            run = jax.jit(lambda n: lax.fori_loop(0, n, lambda i, s: fn(s), jnp.float32(0.0)))
            sync = lambda out: float(out)
        t0 = time.time(); sync(run(2)); tc = time.time() - t0
        t0 = time.time(); sync(run(2)); t_base = time.time() - t0
        t0 = time.time(); sync(run(2 + iters))
        dt = (time.time() - t0 - t_base) / iters
        print(f"{name:28s} {dt*1e3:9.2f} ms  (compile {tc:.0f}s)", flush=True)
        return dt

    a = timeit("render fwd+bwd", fwdbwd)
    b = timeit("+ L1/SSIM loss", withloss)
    c = timeit("full train_step", None, full=True)
    print("\n--- deltas ---")
    print(f"render fwd+bwd        {a*1e3:8.2f} ms")
    print(f"loss (L1+SSIM) AD     {(b-a)*1e3:8.2f} ms")
    print(f"Adam+stats+rest       {(c-b)*1e3:8.2f} ms")
    print(f"TOTAL full step       {c*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
