#!/usr/bin/env python
"""Gaussians-vs-throughput curve: full train_step at 1080p over synthetic
scenes of increasing primitive count (the realistic-scale bench VERDICT asked
for — 3DGS scenes densify into the 0.5-5M range).

Scenes are built by jitter-replicating the bundled table_ds cloud so the
screen-space statistics stay scene-like (many small splats + some large
low-opacity ones). Reports ms/step, MPix/s, instance counts and overflow at
each point. Timing: chained on-device fori_loop, one dispatch (see bench.py).

Usage: PYTHONPATH=/root/repo python tools/scale_bench.py [--variant V] [n1 n2 ...]
Default points: 17618 100000 200000 500000 1000000
Variants: default | transposed | bf16 — the layout/precision axes the
deviceless compiler analysis says matter most at scale (BENCH_SCALE.md);
run each on-chip to decide the large-scene default.
"""

import math
import sys
import time

import numpy as np


def build_scene(pcd, n_target, rng):
    """Jitter-replicate a point cloud to n_target points."""
    from gaussian_transformer_tpu.scene.gaussians import GaussianScene
    from gaussian_transformer_tpu.utils.graphics import BasicPointCloud

    pts, cols = pcd.points, pcd.colors
    n0 = pts.shape[0]
    reps = int(np.ceil(n_target / n0))
    extent = np.abs(pts - pts.mean(0)).max()
    # Jitter scale ~ local spacing so replicas spread instead of stacking.
    jitter = 0.02 * extent
    big_pts = np.concatenate([pts + rng.randn(n0, 3) * (0 if r == 0 else jitter)
                              for r in range(reps)])[:n_target]
    big_cols = np.concatenate([cols for _ in range(reps)])[:n_target]
    big_norms = np.zeros_like(big_pts)
    big = BasicPointCloud(points=big_pts.astype(np.float32),
                          colors=big_cols.astype(np.float32),
                          normals=big_norms.astype(np.float32))
    return GaussianScene.from_pcd(big, max_sh_degree=1)


VARIANTS = {
    "default": {},
    # "transposed" retired to attic/stream_t.py (2.8x measured loss, BENCH_SCALE.md)
    "bf16": {"precision": "bf16"},
}


def main():
    argv = list(sys.argv[1:])
    variant = "default"
    if "--variant" in argv:
        i = argv.index("--variant")
        variant = argv[i + 1]
        del argv[i:i + 2]
    cfg_kwargs = VARIANTS[variant]
    points = [int(a) for a in argv] or [17618, 100_000, 200_000, 500_000, 1_000_000]
    import jax
    import jax.lax as lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/gt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from gaussian_transformer_tpu.render import RenderConfig, render, tune_config
    from gaussian_transformer_tpu.scene.cameras import Camera
    from gaussian_transformer_tpu.scene.densify import DensifyStats
    from gaussian_transformer_tpu.scene.ply import fetch_point_cloud
    from gaussian_transformer_tpu.train.optim import AdamState
    from gaussian_transformer_tpu.train.splat import OptConfig, train_step

    WIDTH, HEIGHT = 1920, 1080
    ITERS = 10
    pcd = fetch_point_cloud("/root/reference/table_ds/sparse/0/points3D.ply")
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

    print(f"variant={variant} ({cfg_kwargs or 'row-major fp32'})", flush=True)
    print(f"{'gaussians':>10} {'n_inst':>9} {'budget':>9} {'ovf':>8} "
          f"{'ms/step':>8} {'MPix/s':>7} {'vs_base':>7}", flush=True)
    for n in points:
        scene = build_scene(pcd, n, rng)
        cfg = RenderConfig(**cfg_kwargs)
        probe = render(cam, scene, cfg)
        n_inst = int(np.asarray(probe["n_instances"]))
        cfg = tune_config(cfg, {k: int(np.asarray(probe[k]))
                                for k in ("n_instances", "n_padded", "n_tiles") if k in probe})
        ovf = int(np.asarray(render(cam, scene, cfg)["overflow"]))
        adam = AdamState.init(scene)
        stats = DensifyStats.init(scene.capacity)

        def body(i, carry):
            s, a, st = carry
            s, a, st, m = train_step(
                s, a, st, cam, bg, i.astype(jnp.float32) + 1.0, slrs, opt, cfg
            )
            return s, a, st

        run = jax.jit(lambda s, a, st, k: lax.fori_loop(0, k, body, (s, a, st)))
        out = run(scene, adam, stats, 2)
        np.asarray(out[0].xyz[:1])
        t0 = time.time()
        out = run(scene, adam, stats, ITERS)
        np.asarray(out[0].xyz[:1])
        dt = (time.time() - t0) / ITERS
        px = WIDTH * HEIGHT / dt
        print(f"{n:>10} {n_inst:>9} {cfg.max_instances:>9} {ovf:>8} "
              f"{dt*1e3:>8.2f} {px/1e6:>7.1f} {px/4.15e7:>7.3f}", flush=True)


if __name__ == "__main__":
    main()
