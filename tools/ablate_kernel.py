#!/usr/bin/env python
"""In-kernel cost attribution by block ablation (GT_ABLATE), on chip.

Times render forward and fwd+bwd at a bench-style scene with individual
kernel blocks stubbed out (WRONG numerics — timing only); the delta vs the
unablated run is that block's cost. Drives the GT_ABLATE knob in
render/stream.py.

Usage: python -m tools.ablate_kernel [n_gauss] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FWD_ABLATIONS = ["", "noread", "noflush", "noscan1,noterm,noexp,noflush"]
BWD_ABLATIONS = ["", "noread", "nofetch", "rawstore", "noflush,nofetch,rawstore",
                 "noscan1,noscan2,noterm,noexp,nomom,noasm,noflush,nofetch,rawstore"]


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
        print(f"  {name:44s} {dt*1e3:9.2f} ms (compile {tc:.0f}s)", flush=True)
        return dt * 1e3

    def fwd(s):
        out = render(cam, scene.replace(xyz=xyz + s * 1e-38), cfg)
        return jnp.sum(out["render"]) * 1e-20

    def fwdbwd(s):
        g = jax.grad(lambda x: jnp.sum(
            render(cam, scene.replace(xyz=x), cfg)["render"]))(xyz + s * 1e-38)
        return jnp.sum(g) * 1e-20

    print(f"n={n_gauss} I={cfg.max_instances} stream={cfg.max_stream}", flush=True)
    base_f = None
    for abl in FWD_ABLATIONS:
        os.environ["GT_ABLATE"] = abl
        t = timeit(f"fwd   [{abl or 'FULL'}]", fwd)
        if abl == "":
            base_f = t
        else:
            print(f"    -> block cost {base_f - t:+.2f} ms", flush=True)
    base_b = None
    for abl in BWD_ABLATIONS:
        os.environ["GT_ABLATE"] = abl
        t = timeit(f"fwdbwd[{abl or 'FULL'}]", fwdbwd)
        if abl == "":
            base_b = t
        else:
            print(f"    -> block cost {base_b - t:+.2f} ms", flush=True)
    os.environ.pop("GT_ABLATE", None)


if __name__ == "__main__":
    main()
