#!/usr/bin/env python
"""Single-session on-chip A/B of the v5 stream-kernel variants.

Sweeps GT_POWER (splat-exponent evaluation: dxdy | fma | mxu), GT_MOM
(backward moment contraction: mxu | vpu) and the stream chunk size, timing
render forward and fwd+bwd at a bench-style densified scene — one process,
one chip session, shared compile cache.

Usage: python -m tools.ab_power [n_gauss] [iters] [--modes dxdy,mxu]
       [--mom mxu,vpu] [--chunk 0,128]
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_gauss", type=int, nargs="?", default=1_000_000)
    ap.add_argument("iters", type=int, nargs="?", default=5)
    ap.add_argument("--modes", default="dxdy,mxu")
    ap.add_argument("--mom", default="mxu")
    ap.add_argument("--chunk", default="0", help="comma list; 0 = auto")
    ap.add_argument("--skip-fwd", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.lax as lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/gt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    import bench
    from gaussian_transformer_tpu.render import RenderConfig, render, tune_config, _auto_chunk
    from gaussian_transformer_tpu.render.tiles import num_tiles
    from gaussian_transformer_tpu.scene.cameras import Camera

    WIDTH, HEIGHT = 1920, 1080
    pcd, center, extent = bench._base_cloud()
    scene = bench._densified_scene(pcd, args.n_gauss)
    rng = np.random.RandomState(0)
    cam = bench._camera(center, extent, rng)
    xyz = scene.get_xyz

    def timeit(name, fn, iters):
        run = jax.jit(lambda n: lax.fori_loop(0, n, lambda i, s: fn(s), jnp.float32(0.0)))
        t0 = time.time(); float(run(2)); tc = time.time() - t0
        t0 = time.time(); float(run(2)); t_base = time.time() - t0
        t0 = time.time(); float(run(2 + iters))
        dt = (time.time() - t0 - t_base) / iters
        print(f"  {name:26s} {dt*1e3:9.2f} ms  (compile {tc:.0f}s)", flush=True)
        return dt

    for chunk_s in args.chunk.split(","):
        chunk = int(chunk_s)
        cfg0 = RenderConfig(chunk=chunk) if chunk else RenderConfig()
        probe = render(cam, scene, cfg0)
        cfg = tune_config(cfg0, {k: int(np.asarray(probe[k]))
                                 for k in ("n_instances", "n_padded", "n_tiles") if k in probe})
        eff_chunk = chunk or _auto_chunk(scene.capacity, num_tiles(WIDTH) * num_tiles(HEIGHT), cfg)
        for mode in args.modes.split(","):
            for mom in args.mom.split(","):
                os.environ["GT_POWER"] = mode
                os.environ["GT_MOM"] = mom
                print(f"chunk={eff_chunk} I={cfg.max_instances} stream={cfg.max_stream} "
                      f"power={mode} mom={mom}", flush=True)

                def fwd(s):
                    out = render(cam, scene.replace(xyz=xyz + s * 1e-38), cfg)
                    return jnp.sum(out["render"]) * 1e-20

                def fwdbwd(s):
                    g = jax.grad(lambda x: jnp.sum(
                        render(cam, scene.replace(xyz=x), cfg)["render"]))(xyz + s * 1e-38)
                    return jnp.sum(g) * 1e-20

                if not args.skip_fwd:
                    timeit(f"fwd[{mode}]", fwd, args.iters)
                timeit(f"fwd+bwd[{mode},{mom}]", fwdbwd, args.iters)


if __name__ == "__main__":
    main()
