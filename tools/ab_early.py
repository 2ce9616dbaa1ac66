#!/usr/bin/env python
"""On-chip A/B of the GT_EARLY gate mode (numerics-identical variants) plus
leftover bwd ablations, one session.

Usage: python -m tools.ab_early [n_gauss] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    from gaussian_transformer_tpu.render import RenderConfig, render, tune_config

    pcd, center, extent = bench._base_cloud()
    scene = bench._densified_scene(pcd, n_gauss)
    rng = np.random.RandomState(0)
    cam = bench._camera(center, extent, rng)
    xyz = scene.get_xyz

    probe = render(cam, scene, RenderConfig())
    cfg = tune_config(RenderConfig(), {k: int(np.asarray(probe[k]))
                                       for k in ("n_instances", "n_padded", "n_tiles") if k in probe})

    def timeit(name, fn):
        run = jax.jit(lambda n: lax.fori_loop(0, n, lambda i, s: fn(s), jnp.float32(0.0)))
        t0 = time.time(); float(run(2)); tc = time.time() - t0
        t0 = time.time(); float(run(2)); t_base = time.time() - t0
        t0 = time.time(); float(run(2 + iters))
        dt = (time.time() - t0 - t_base) / iters
        print(f"  {name:40s} {dt*1e3:9.2f} ms (compile {tc:.0f}s)", flush=True)
        return dt * 1e3

    def fwd(s):
        out = render(cam, scene.replace(xyz=xyz + s * 1e-38), cfg)
        return jnp.sum(out["render"]) * 1e-20

    def fwdbwd(s):
        g = jax.grad(lambda x: jnp.sum(
            render(cam, scene.replace(xyz=x), cfg)["render"]))(xyz + s * 1e-38)
        return jnp.sum(g) * 1e-20

    print(f"n={n_gauss} I={cfg.max_instances} stream={cfg.max_stream}", flush=True)
    for em in ("lag", "scalar", "max"):
        os.environ["GT_EARLY"] = em
        timeit(f"fwd   [early={em}]", fwd)
        timeit(f"fwdbwd[early={em}]", fwdbwd)
    os.environ["GT_EARLY"] = "lag"
    for abl in ():
        os.environ["GT_ABLATE"] = abl
        timeit(f"fwdbwd[{abl}]", fwdbwd)
    os.environ.pop("GT_ABLATE", None)


if __name__ == "__main__":
    main()
