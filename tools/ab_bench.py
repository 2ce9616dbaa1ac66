#!/usr/bin/env python
"""A/B benchmark of render-config variants: full train_step (fwd+bwd+Adam)
at 1080p on the table_ds cloud, timed as ITERS chained on-device steps in one
dispatch (see bench.py for why).

Usage: PYTHONPATH=/root/repo python tools/ab_bench.py [variant ...]
Variants: stream, table, xla (default: stream table).
"""

import math
import sys
import time

import numpy as np


def main():
    variants = sys.argv[1:] or ["stream", "table"]
    import jax
    import jax.lax as lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/gt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from gaussian_transformer_tpu.render import RenderConfig, render, tune_config
    from gaussian_transformer_tpu.scene.cameras import Camera
    from gaussian_transformer_tpu.scene.gaussians import GaussianScene
    from gaussian_transformer_tpu.scene.densify import DensifyStats
    from gaussian_transformer_tpu.scene.ply import fetch_point_cloud
    from gaussian_transformer_tpu.train.optim import AdamState
    from gaussian_transformer_tpu.train.splat import OptConfig, train_step

    WIDTH, HEIGHT = 1920, 1080
    ITERS = 10
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
    opt = OptConfig()
    bg = jnp.zeros(3, jnp.float32)
    slrs = jnp.asarray(extent, jnp.float32)

    cfgs = {
        "stream": RenderConfig(use_pallas=True, use_stream=True),
        "table": RenderConfig(use_pallas=True, use_stream=False, max_per_tile=256),
        "xla": RenderConfig(use_pallas=False, max_per_tile=256),
        # v3 tuning axes (run on-chip to pick block_rows/chunk/precision):
        "stream_br1024": RenderConfig(block_rows=1024),
        "stream_br4096": RenderConfig(block_rows=4096),
        "stream_ch64": RenderConfig(chunk=64),
        "stream_ch64_br4096": RenderConfig(chunk=64, block_rows=4096),
        "stream_bf16": RenderConfig(precision="bf16"),
        # "stream_transposed" retired to attic/stream_t.py (2.8x measured loss)
    }

    for name in variants:
        cfg = cfgs[name]
        probe = render(cam, scene, cfg)
        n_inst = int(np.asarray(probe["n_instances"]))
        cfg = tune_config(cfg, {k: int(np.asarray(probe[k])) for k in ("n_instances", "n_padded", "n_tiles") if k in probe})
        ovf = int(np.asarray(render(cam, scene, cfg)["overflow"]))
        adam = AdamState.init(scene)
        stats = DensifyStats.init(scene.capacity)

        def body(i, carry):
            s, a, st = carry
            s, a, st, m = train_step(
                s, a, st, cam, bg, i.astype(jnp.float32) + 1.0, slrs, opt, cfg
            )
            return s, a, st

        run = jax.jit(lambda s, a, st, n: lax.fori_loop(0, n, body, (s, a, st)))
        t0 = time.time()
        out = run(scene, adam, stats, 2)
        np.asarray(out[0].xyz[:1])
        tc = time.time() - t0
        t0 = time.time()
        out = run(scene, adam, stats, ITERS)
        np.asarray(out[0].xyz[:1])
        dt = (time.time() - t0) / ITERS
        px = WIDTH * HEIGHT / dt
        print(
            f"{name:8s} n_inst={n_inst} budget={cfg.max_instances} overflow={ovf} "
            f"{dt*1e3:7.2f} ms/step  {px/1e6:6.1f} MPix/s  vs_baseline={px/4.15e7:.3f} "
            f"(compile+warm {tc:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
